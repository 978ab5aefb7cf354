"""Vision side of the Sensor/Encoder bridge (reference: pc_sensor.py,
pc_encoder.py): point-cloud sensing + trained-model encoders."""
