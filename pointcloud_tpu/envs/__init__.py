"""Environment layer: scene configs, Sensor/Encoder ABCs, GoalEnv wrapper.

Reference: robosuite_envs/. robosuite/MuJoCo is an optional host-side
dependency; the Passthrough sensor/encoder pair and the synthetic scene
backend let the full stack run (and be tested) without it.
"""
