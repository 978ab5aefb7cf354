"""Heads and full architectures (reference: models/architectures.py:10-208).

`backbone_factory` maps backbone names to encoder constructors; AE / SegAE /
MultiSegAE / MultiGTEncoder assemble backbone + bottleneck + decoder heads.
All are Flax Linen modules; per-model-type wiring (losses, datasets) lives in
the training harness (train/harness.py), mirroring reference train.py:71-163.
"""

from __future__ import annotations

from typing import Mapping, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from pointcloud_tpu.models.pointnet import PointNetEncoder
from pointcloud_tpu.models.pointnet2 import PointNet2Encoder
from pointcloud_tpu.models.pointmlp import PointMLP, PointMLPElite

Array = jax.Array

# Reference architectures.py:10-15.
backbone_factory = {
    "PointNet": PointNetEncoder,
    "PointNet2": PointNet2Encoder,
    "PointMLP": PointMLP,
    "PointMLPE": PointMLPElite,
}


def encoding_dim_of(backbone) -> int:
    """Output width of a backbone instance (handles PointMLPElite's 256)."""
    return getattr(backbone, "encoding_dim", None) or backbone.ENCODING_DIM


class MLP(nn.Module):
    """Plain FC MLP (reference architectures.py:186-208).

    output_activation: None | 'relu' | 'sigmoid'.
    """

    hidden_sizes: Sequence[int]
    output_size: int
    output_activation: str | None = "relu"
    dtype: jnp.dtype | None = None  # hidden compute dtype; output stays fp32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for h in self.hidden_sizes:
            x = nn.relu(nn.Dense(h, dtype=self.dtype)(x))
        # final layer in fp32: decoder coordinates / logits keep full
        # precision regardless of the hidden compute dtype
        x = nn.Dense(self.output_size)(x.astype(jnp.float32))
        if self.output_activation == "relu":
            x = nn.relu(x)
        elif self.output_activation == "sigmoid":
            x = nn.sigmoid(x)
        return x


class PCDecoder(nn.Module):
    """FC cloud decoder: encoding -> (B, out_points, out_dim), sigmoid output
    (reference architectures.py:141-155; coords live in the unit cube)."""

    out_points: int
    out_dim: int
    hidden_sizes: Sequence[int] = (512, 1024, 2048)
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = MLP(
            self.hidden_sizes, self.out_points * self.out_dim, "sigmoid",
            dtype=self.dtype,
        )(x)
        return x.reshape(-1, self.out_points, self.out_dim)


class PCSegmenter(nn.Module):
    """Decoder emitting xyz (sigmoid) + per-class logits (raw)
    (reference architectures.py:157-183)."""

    out_points: int
    num_classes: int
    hidden_sizes: Sequence[int] = (512, 1024, 2048)
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_dim = 3 + self.num_classes
        x = MLP(
            self.hidden_sizes, self.out_points * out_dim, None, dtype=self.dtype
        )(x)
        x = x.reshape(-1, self.out_points, out_dim)
        xyz = nn.sigmoid(x[..., :3])
        return jnp.concatenate([xyz, x[..., 3:]], axis=-1)


class PCEncoder(nn.Module):
    """Backbone + bottleneck projection (reference PCEncoder,
    architectures.py:114-125)."""

    backbone: nn.Module
    bottleneck: int
    hidden_sizes: Sequence[int] = ()
    output_activation: str | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False, mask: Array | None = None):
        h = self.backbone(x, train=train, mask=mask)
        return MLP(
            self.hidden_sizes, self.bottleneck, self.output_activation,
            dtype=self.dtype,
        )(h)


class GTEncoder(nn.Module):
    """Backbone + state regression head with sigmoid output
    (reference architectures.py:128-138)."""

    backbone: nn.Module
    out_dim: int
    hidden_sizes: Sequence[int] = (512, 256, 128)
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False, mask: Array | None = None):
        h = self.backbone(x, train=train, mask=mask)
        return MLP(self.hidden_sizes, self.out_dim, "sigmoid", dtype=self.dtype)(h)


class PCEncoderDecoder(nn.Module):
    """Encoder + decoder; `encode()` exposes the bottleneck for inference
    (the reference caches `self.encoding` on forward, architectures.py:21-33 —
    functional style returns it instead)."""

    encoder: nn.Module
    decoder: nn.Module

    def __call__(self, x, train: bool = False, mask: Array | None = None):
        return self.decoder(self.encoder(x, train=train, mask=mask), train=train)

    def encode(self, x, train: bool = False, mask: Array | None = None):
        return self.encoder(x, train=train, mask=mask)


def AE(
    preencoder,
    out_points: int = 2048,
    out_dim: int = 6,
    bottleneck: int = 16,
    dtype=None,
):
    """Global autoencoder (reference architectures.py:35-38)."""
    return PCEncoderDecoder(
        encoder=PCEncoder(backbone=preencoder, bottleneck=bottleneck, dtype=dtype),
        decoder=PCDecoder(out_points=out_points, out_dim=out_dim, dtype=dtype),
    )


def SegAE(
    preencoder,
    num_classes: int,
    out_points: int = 2048,
    bottleneck: int = 16,
    dtype=None,
):
    """Autoencoder with segmentation output (reference architectures.py:40-43)."""
    return PCEncoderDecoder(
        encoder=PCEncoder(backbone=preencoder, bottleneck=bottleneck, dtype=dtype),
        decoder=PCSegmenter(
            out_points=out_points, num_classes=num_classes, dtype=dtype
        ),
    )


class MultiSegAE(nn.Module):
    """Shared backbone + per-class {bottleneck -> decoder} experts
    (reference architectures.py:64-96).

    name_points_dims: (class_name, out_points, bottleneck_dim) triples.
    `__call__` returns {name: (B, n_points, 3)}; `encode` returns the
    per-class bottleneck dict; `reconstruct_labeled` concatenates per-class
    clouds with an integer label column.
    """

    preencoder: nn.Module
    class_labels: Mapping[str, int]
    name_points_dims: Sequence[Tuple[str, int, int]]
    dtype: jnp.dtype | None = None

    def setup(self):
        dim = encoding_dim_of(self.preencoder)
        self.bottlenecks = {
            name: MLP(
                (512, 256), bneck, None, dtype=self.dtype,
                name=f"bottleneck_{name}",
            )
            for name, _, bneck in self.name_points_dims
        }
        self.decoders = {
            name: PCDecoder(
                out_points=npts,
                out_dim=3,
                hidden_sizes=(256, 512),
                dtype=self.dtype,
                name=f"decoder_{name}",
            )
            for name, npts, _ in self.name_points_dims
        }
        del dim

    def __call__(self, x, train: bool = False, mask: Array | None = None):
        g = self.preencoder(x, train=train, mask=mask)
        return {
            name: self.decoders[name](self.bottlenecks[name](g), train=train)
            for name, _, _ in self.name_points_dims
        }

    def encode(self, x, train: bool = False, mask: Array | None = None):
        """Per-class local encodings (reference forward_encoders /
        local_encodings, architectures.py:77-96)."""
        g = self.preencoder(x, train=train, mask=mask)
        return {
            name: self.bottlenecks[name](g) for name, _, _ in self.name_points_dims
        }

    def encode_flat(self, x, train: bool = False, mask: Array | None = None):
        """Concatenated per-class encodings (reference flat_local_encodings)."""
        enc = self.encode(x, train=train, mask=mask)
        return jnp.concatenate(
            [enc[name] for name, _, _ in self.name_points_dims], axis=-1
        )

    def reconstruct_labeled(self, x, train: bool = False, mask: Array | None = None):
        """Concat per-class clouds with their integer label as a 4th column
        (reference architectures.py:81-88)."""
        clouds = self(x, train=train, mask=mask)
        labeled = []
        for name, _, _ in self.name_points_dims:
            pc = clouds[name]
            label = jnp.full((*pc.shape[:2], 1), self.class_labels[name], pc.dtype)
            labeled.append(jnp.concatenate([pc, label], axis=-1))
        return jnp.concatenate(labeled, axis=1)


class MultiGTEncoder(nn.Module):
    """Shared backbone + per-state MLP heads (reference architectures.py:98-110).

    state_dims: {state_name: dim}; returns {state_name: (B, dim)} in [0, 1].
    """

    preencoder: nn.Module
    state_dims: Mapping[str, int]
    dtype: jnp.dtype | None = None

    def setup(self):
        self.heads = {
            name: MLP(
                (512, 256, 128), dim, "sigmoid", dtype=self.dtype,
                name=f"head_{name}",
            )
            for name, dim in dict(self.state_dims).items()
        }

    def __call__(self, x, train: bool = False, mask: Array | None = None):
        g = self.preencoder(x, train=train, mask=mask)
        return {name: head(g) for name, head in self.heads.items()}

    def encode(self, x, train: bool = False, mask: Array | None = None):
        out = self(x, train=train, mask=mask)
        return jnp.concatenate(
            [out[name] for name in self.state_dims], axis=-1
        )
