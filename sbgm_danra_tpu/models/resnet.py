"""ResNet basic blocks for the encoder backbone.

The reference encoder subclasses torchvision's ResNet-18 (BasicBlock stacks,
sbgm/score_unet.py:151-219). Here the same topology is built natively in Flax,
NHWC, with explicit padding chosen to reproduce torch's conv geometry exactly
(torch pads (1,1) for 3x3 stride-2 convs; XLA 'SAME' would pad (0,1)).

BatchNorm uses a ``batch_stats`` collection; pass ``train=True`` during training
(batch statistics + running-average update) and ``train=False`` for eval/sampling.
When data-parallel, set ``bn_axis_name`` so statistics sync across the mesh —
a capability the single-device reference lacks.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def conv3x3(features: int, stride: int = 1, name: Optional[str] = None, dtype=jnp.float32):
    return nn.Conv(
        features,
        kernel_size=(3, 3),
        strides=(stride, stride),
        padding=((1, 1), (1, 1)),
        use_bias=False,
        dtype=dtype,
        name=name,
    )


def conv1x1(features: int, stride: int = 1, name: Optional[str] = None, dtype=jnp.float32):
    return nn.Conv(
        features,
        kernel_size=(1, 1),
        strides=(stride, stride),
        padding="VALID",
        use_bias=False,
        dtype=dtype,
        name=name,
    )


class BatchNorm(nn.Module):
    """BatchNorm2d with torch-default hyperparameters (momentum 0.1, eps 1e-5).

    ``dtype`` is the RESULT dtype only: flax computes the batch statistics in
    float32 regardless, and params/running stats stay float32. Returning the
    compute dtype keeps bf16 activations bf16 between convs — an fp32 norm
    output would double the HBM bytes of every inter-layer tensor.
    """

    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,  # flax momentum = 1 - torch momentum (0.1)
            epsilon=1e-5,
            dtype=self.dtype,
            axis_name=self.axis_name if train else None,
        )(x)


class BasicBlock(nn.Module):
    """conv3x3 -> BN -> relu -> conv3x3 -> BN, residual add, relu.

    Downsample path (1x1 conv + BN) when stride != 1 or channels change —
    identical topology to torchvision BasicBlock used by the reference encoder.
    """

    features: int
    stride: int = 1
    bn_axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        identity = x
        out = conv3x3(self.features, self.stride, name="conv1", dtype=self.dtype)(x)
        out = BatchNorm(self.bn_axis_name, self.dtype, name="bn1")(out, train)
        out = nn.relu(out)
        out = conv3x3(self.features, 1, name="conv2", dtype=self.dtype)(out)
        out = BatchNorm(self.bn_axis_name, self.dtype, name="bn2")(out, train)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = conv1x1(self.features, self.stride, name="down_conv", dtype=self.dtype)(x)
            identity = BatchNorm(self.bn_axis_name, self.dtype, name="down_bn")(identity, train)
        return nn.relu(out + identity)


class ResNetStage(nn.Module):
    """A stack of BasicBlocks; the first block carries the stride."""

    features: int
    num_blocks: int
    stride: int = 1
    bn_axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        for i in range(self.num_blocks):
            x = BasicBlock(
                self.features,
                stride=self.stride if i == 0 else 1,
                bn_axis_name=self.bn_axis_name,
                dtype=self.dtype,
                name=f"block{i}",
            )(x, train)
        return x
