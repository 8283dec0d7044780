"""Conditional score UNet (Flax, NHWC).

TPU-native re-design of the reference's conditional score network
(sbgm/score_unet.py:151-879): a ResNet-18-style encoder over the channel-concat
of [noised HR, lsm value||mask, topo value||mask, LR conditions], per-stage
additive time projections, self-attention on the two coarsest encoder stages and
the two lowest-resolution decoder blocks, a resize-conv decoder with skip-adds,
a norm/activation-free head, and a final division by the VE marginal std.

Topology parity targets (checked by tests/test_model.py):
- five encoder feature maps with channels [64, 64, 128, 256, 512] at strides
  [2, 4, 4, 8, 16, 32] of the input (reference :198, :312-361);
- 17,511,874 trainable parameters in the reference configuration (128x128,
  2 LR conditions, lsm+topo geo, 4 seasons; BASELINE.md);
- label embedding has num_classes+1 rows with row 0 (the CFG null token)
  zero-initialized but trainable (reference :222-226).

TPU-first choices:
- NHWC everywhere; channel concat and the token reshape for attention are free;
- explicit conv padding replicating torch geometry (torch pads 3x3/s2 as (1,1));
- optional bfloat16 compute (params float32);
- attention backend switchable to the Pallas flash kernel;
- BatchNorm can sync across a mesh axis (``bn_axis_name``) for data-parallel
  training — the reference is single-device and has no equivalent.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from sbgm_danra_tpu.models.attention import SpatialSelfAttention
from sbgm_danra_tpu.models.embeddings import GaussianFourierEmbedding
from sbgm_danra_tpu.models.resnet import BatchNorm, ResNetStage

Array = jax.Array

_ACTIVATIONS = {
    "relu": nn.relu,
    "silu": nn.silu,
    "gelu": nn.gelu,
    "identity": lambda x: x,
}


def _time_projection(temb: Array, features: int, name: str, dtype=jnp.float32) -> Array:
    """SiLU -> Dense(features): the reference's per-stage time projection
    (sbgm/score_unet.py:367-383)."""
    return nn.Dense(features, dtype=dtype, name=name)(nn.silu(temb))


class _ConvParams(nn.Module):
    """Parameter holder with nn.Conv's exact param tree (same names, shapes,
    inits, and module path => identical checkpoint layout and init values) for
    layers whose forward is computed by a custom op instead of nn.Conv."""

    features: int
    kernel_size: Tuple[int, int]
    use_bias: bool = True

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (*self.kernel_size, in_features, self.features),
            jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros_init(), (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        return kernel, bias


class Stride2Conv8(nn.Module):
    """torch Conv2d(k=8, s=2, p=3, bias=False) stem (reference :206-219).

    ``impl='s2d'`` computes the identical map as a space-to-depth 4x4 stride-1
    conv (ops/stem_conv.py) — the large-kernel strided conv is the encoder's
    bandwidth sink on TPU. Param tree matches nn.Conv, so checkpoints are
    interchangeable across impls.
    """

    features: int
    impl: str = "direct"  # 'direct' | 's2d'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from sbgm_danra_tpu.ops.stem_conv import conv8x8s2_direct, conv8x8s2_s2d

        # param lives at THIS module's path, named like nn.Conv's ("kernel")
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (8, 8, x.shape[-1], self.features),
            jnp.float32,
        )
        x = x.astype(self.dtype)
        kernel = kernel.astype(self.dtype)
        fn = conv8x8s2_s2d if self.impl == "s2d" else conv8x8s2_direct
        return fn(x, kernel)


class Encoder(nn.Module):
    """ResNet-backbone encoder returning 5 feature maps (reference :151-404)."""

    time_embedding: int = 256
    block_layers: Sequence[int] = (2, 2, 2, 2)
    n_heads: int = 4
    num_classes: Optional[int] = None
    fmap_channels: Sequence[int] = (64, 64, 128, 256, 512)
    attention_backend: str = "xla"
    compute_dtype: jnp.dtype = jnp.float32
    bn_axis_name: Optional[str] = None
    # number of coarsest stages with self-attention: 2 = reference current
    # (:393-397), 5 = the reference's OLD all-stages revision (docs/PARAMS.md),
    # 0 = none (ablation / perf probes)
    attn_stages: int = 2
    # stem lowering: 'direct' (one strided conv) | 's2d' (space-to-depth,
    # measured faster on v5e — scripts/perf_probe.py cand); same params
    stem_impl: str = "direct"

    @nn.compact
    def __call__(
        self,
        x: Array,
        t: Array,
        y: Optional[Array] = None,
        cond_img: Optional[Array] = None,
        lsm_cond: Optional[Array] = None,
        topo_cond: Optional[Array] = None,
        train: bool = False,
    ) -> Tuple[Array, ...]:
        # Conditioning enters as channel concat, in the reference's order
        # (noised HR, lsm, topo, LR conditions — :273-291).
        parts = [x]
        if lsm_cond is not None:
            parts.append(lsm_cond)
        if topo_cond is not None:
            parts.append(topo_cond)
        if cond_img is not None:
            parts.append(cond_img)
        x = jnp.concatenate(parts, axis=-1) if len(parts) > 1 else x

        temb = GaussianFourierEmbedding(self.time_embedding, name="time_embed")(t)
        if self.num_classes is not None and y is not None:
            # num_classes + 1 rows; row 0 is the CFG null token, zero-initialized
            # but trainable (reference :222-226).
            def _label_init(key, shape, dtype=jnp.float32):
                emb = jax.random.normal(key, shape, dtype)
                return emb.at[0].set(0.0)

            label_emb = nn.Embed(
                self.num_classes + 1,
                self.time_embedding,
                embedding_init=_label_init,
                name="label_emb",
            )
            temb = temb + label_emb(y.astype(jnp.int32))

        dtype = self.compute_dtype
        chans = list(self.fmap_channels)
        n_maps = len(chans)

        def stride2_conv8(features: int, name: str):
            # torch Conv2d(k=8, s=2, p=3, bias=False) geometry (reference :206-219).
            return Stride2Conv8(features, impl=self.stem_impl, dtype=dtype, name=name)

        def add_temb(fmap: Array, idx: int) -> Array:
            proj = _time_projection(temb, fmap.shape[-1], f"time_proj{idx}", dtype)
            return fmap + proj[:, None, None, :].astype(fmap.dtype)

        def maybe_attend(fmap: Array, idx: int) -> Array:
            # Attention only on the ``attn_stages`` coarsest stages
            # (reference :393-397 has 2).
            if idx >= n_maps - self.attn_stages:
                return SpatialSelfAttention(
                    fmap.shape[-1],
                    self.n_heads,
                    backend=self.attention_backend,
                    compute_dtype=dtype,
                    name=f"attn{idx}",
                )(fmap)
            return fmap

        fmaps = []
        h = stride2_conv8(chans[0], "conv1")(x.astype(dtype))
        h = maybe_attend(add_temb(h, 0), 0)
        fmaps.append(h)

        h = stride2_conv8(chans[1], "conv2")(h)
        h = BatchNorm(self.bn_axis_name, dtype, name="bn1")(h, train)
        h = nn.relu(h)

        strides = (1, 2, 2, 2)
        for i, (features, blocks, stride) in enumerate(
            zip(chans[1:], self.block_layers, strides)
        ):
            h = ResNetStage(
                features,
                blocks,
                stride=stride,
                bn_axis_name=self.bn_axis_name,
                dtype=dtype,
                name=f"layer{i + 1}",
            )(h, train)
            h = maybe_attend(add_temb(h, i + 1), i + 1)
            fmaps.append(h)

        return tuple(fmaps)


def _make_norm(kind: str, channels: int, gn_groups: int, name: str, dtype=jnp.float32):
    """'group' | 'instance' | 'none' (reference DecoderBlock :480-492).

    ``dtype`` is the result dtype (statistics are computed in float32 by flax);
    returning the compute dtype keeps bf16 activation chains bf16.
    """
    if kind == "group":
        return nn.GroupNorm(
            num_groups=max(1, min(gn_groups, channels)), epsilon=1e-5, dtype=dtype,
            name=name,
        )
    if kind == "instance":
        # torch InstanceNorm2d default: per-(sample, channel) stats, no affine.
        return nn.GroupNorm(
            num_groups=channels, epsilon=1e-5, use_bias=False, use_scale=False,
            dtype=dtype, name=name,
        )
    if kind in ("none", None):
        return lambda v: v
    raise ValueError(f"Unknown norm kind: {kind}")


class DecoderBlock(nn.Module):
    """Upsample x2 (bilinear resize + 3x3 conv), norm, 3x3 conv to output width,
    norm, skip-add, time-add, activation, optional attention (reference :409-627).

    ``use_resize_conv=False`` selects the ConvTranspose ablation path.
    The time-projection parameters are created even when ``t`` is None so the
    parameter tree matches the reference module-for-module (its final decoder
    block registers — but never uses — a time projection).
    """

    output_channels: int
    time_embedding: int = 256
    upsample_scale: int = 2
    activation: str = "relu"
    compute_attn: bool = False
    n_heads: int = 4
    use_resize_conv: bool = True
    norm: str = "group"
    gn_groups: int = 8
    attention_backend: str = "xla"
    compute_dtype: jnp.dtype = jnp.float32
    # 'none' keeps the two-op chain; 'dilated'/'phases' compute the identical
    # upsample+conv as ONE convolution (ops/fused_upsample.py), skipping the
    # doubled-resolution intermediate's HBM round-trip. Params are unchanged.
    fuse_upsample: str = "none"
    # Fuse the whole block into ONE convolution when it is linear (final block:
    # norm 'none', identity activation, no skip, no t — ops/fused_head.py).
    # The two doubled-resolution intermediates it removes are the largest
    # activations of the network; with C=64 lane padding they cost ~0.6 ms of
    # the 3.36 ms flagship forward on v5e. Params are unchanged.
    fuse_head: bool = False

    def _linear_chain(self) -> bool:
        return (
            self.use_resize_conv
            and self.upsample_scale == 2
            and self.norm in ("none", None)
            and self.activation == "identity"
            and not self.compute_attn
        )

    @nn.compact
    def __call__(
        self,
        fmap: Array,
        skip: Optional[Array] = None,
        t: Optional[Array] = None,
    ) -> Array:
        dtype = self.compute_dtype
        b, h, w, c = fmap.shape
        if self.fuse_head and self._linear_chain() and skip is None and t is None:
            from sbgm_danra_tpu.ops.fused_head import fused_head

            k_up, b_up = _ConvParams(c, (3, 3), name="conv_up")(c)
            k_f, b_f = _ConvParams(self.output_channels, (3, 3), name="conv")(c)
            x = fused_head(
                fmap.astype(dtype),
                k_up.astype(dtype),
                b_up.astype(dtype),
                k_f.astype(dtype),
                b_f.astype(dtype),
            )
            # parity: the final block still registers its (unused) time params
            temb_mod = GaussianFourierEmbedding(self.time_embedding, name="time_embed")
            proj = nn.Dense(self.output_channels, dtype=dtype, name="time_proj")
            _ = proj(nn.silu(temb_mod(jnp.zeros((1,), jnp.float32))))
            return x
        if self.use_resize_conv:
            if self.fuse_upsample != "none" and self.upsample_scale == 2:
                from sbgm_danra_tpu.ops.fused_upsample import (
                    fused_upsample_conv_dilated,
                    fused_upsample_conv_phases,
                )

                kernel, bias = _ConvParams(c, (3, 3), name="conv_up")(c)
                fused = (
                    fused_upsample_conv_phases
                    if self.fuse_upsample == "phases"
                    else fused_upsample_conv_dilated
                )
                x = fused(fmap.astype(dtype), kernel.astype(dtype), bias.astype(dtype))
            else:
                if self.upsample_scale == 2:
                    # exact bilinear as a depthwise dilated conv — the
                    # gather-based jax.image.resize lowering is the slow path
                    from sbgm_danra_tpu.ops.upsample import upsample2x_bilinear

                    x = upsample2x_bilinear(fmap)
                else:
                    x = jax.image.resize(
                        fmap,
                        (b, h * self.upsample_scale, w * self.upsample_scale, c),
                        method="bilinear",
                    )
                x = nn.Conv(
                    c,
                    kernel_size=(3, 3),
                    padding=((1, 1), (1, 1)),
                    use_bias=True,
                    dtype=dtype,
                    name="conv_up",
                )(x)
        else:
            x = nn.ConvTranspose(
                c,
                kernel_size=(self.upsample_scale, self.upsample_scale),
                strides=(self.upsample_scale, self.upsample_scale),
                padding="VALID",
                dtype=dtype,
                name="transpose",
            )(fmap)
        x = _make_norm(self.norm, c, self.gn_groups, "norm1", dtype)(x)

        x = nn.Conv(
            self.output_channels,
            kernel_size=(3, 3),
            padding=((1, 1), (1, 1)),
            use_bias=True,
            dtype=dtype,
            name="conv",
        )(x)
        x = _make_norm(self.norm, self.output_channels, self.gn_groups, "norm2", dtype)(x)

        if skip is not None:
            if skip.shape != x.shape:
                raise ValueError(f"skip shape {skip.shape} must match {x.shape}")
            x = x + skip

        # Each decoder block re-embeds raw t with its own fixed frequencies
        # (reference :500-504 — every block owns a SinusoidalEmbedding).
        temb_mod = GaussianFourierEmbedding(self.time_embedding, name="time_embed")
        proj = nn.Dense(self.output_channels, dtype=dtype, name="time_proj")
        if t is not None:
            temb = temb_mod(t)
            x = x + proj(nn.silu(temb))[:, None, None, :].astype(x.dtype)
        else:
            # Materialize identical params even when unused (parity with the
            # reference's registered-but-unused final-block projection).
            _ = proj(nn.silu(temb_mod(jnp.zeros((1,), jnp.float32))))

        x = _ACTIVATIONS[self.activation](x)

        if self.compute_attn:
            x = SpatialSelfAttention(
                self.output_channels,
                self.n_heads,
                backend=self.attention_backend,
                compute_dtype=dtype,
                name="attention",
            )(x)
        return x


class Decoder(nn.Module):
    """Four residual decoder blocks halving channels to ``first_fmap_channels``,
    then a norm/activation-free final block (reference :662-789)."""

    last_fmap_channels: int = 512
    output_channels: int = 1
    time_embedding: int = 256
    first_fmap_channels: int = 64
    n_heads: int = 4
    n_blocks: int = 4
    use_resize_conv: bool = True
    norm: str = "group"
    gn_groups: int = 8
    activation: str = "relu"
    attention_backend: str = "xla"
    compute_dtype: jnp.dtype = jnp.float32
    # residual blocks nearest the bottleneck that attend (reference :780 has 2)
    attn_blocks: int = 2
    fuse_upsample: str = "none"  # see DecoderBlock.fuse_upsample
    fuse_head: bool = False  # see DecoderBlock.fuse_head (final block only)

    @nn.compact
    def __call__(self, fmaps: Sequence[Array], t: Optional[Array] = None) -> Array:
        if len(fmaps) != self.n_blocks + 1:
            raise ValueError(
                f"Decoder expected {self.n_blocks + 1} feature maps, got {len(fmaps)}"
            )
        rev = list(reversed(fmaps))
        in_ch = self.last_fmap_channels
        out = rev[0]
        for i in range(self.n_blocks):
            out_ch = in_ch // 2 if i != self.n_blocks - 1 else self.first_fmap_channels
            out = DecoderBlock(
                output_channels=out_ch,
                time_embedding=self.time_embedding,
                activation=self.activation,
                # Attention only on the blocks nearest the bottleneck
                # (reference :780 — larger maps are "very expensive").
                compute_attn=(i < self.attn_blocks),
                n_heads=self.n_heads,
                use_resize_conv=self.use_resize_conv,
                norm=self.norm,
                gn_groups=self.gn_groups,
                attention_backend=self.attention_backend,
                compute_dtype=self.compute_dtype,
                fuse_upsample=self.fuse_upsample,
                name=f"block{i}",
            )(out, rev[i + 1], t)
            in_ch = out_ch
        # Final block: no norm, identity activation, no attention, no skip, no t
        # (reference :713-730 strips norms/activation after construction).
        out = DecoderBlock(
            output_channels=self.output_channels,
            time_embedding=self.time_embedding,
            activation="identity",
            compute_attn=False,
            n_heads=self.n_heads,
            use_resize_conv=self.use_resize_conv,
            norm="none",
            gn_groups=self.gn_groups,
            attention_backend=self.attention_backend,
            compute_dtype=self.compute_dtype,
            fuse_upsample=self.fuse_upsample,
            fuse_head=self.fuse_head,
            name="final",
        )(out, None, None)
        return out


class ScoreUNet(nn.Module):
    """Encoder -> decoder -> divide by VE marginal std (reference :792-879).

    ``marginal_prob_std`` is a static callable t -> std[B]; output is the score
    estimate s(x_t, t | cond) in NHWC.
    """

    marginal_prob_std: Callable[[Array], Array]
    encoder: Encoder
    decoder: Decoder

    @nn.compact
    def __call__(
        self,
        x: Array,
        t: Array,
        y: Optional[Array] = None,
        cond_img: Optional[Array] = None,
        lsm_cond: Optional[Array] = None,
        topo_cond: Optional[Array] = None,
        train: bool = False,
    ) -> Array:
        t = jnp.asarray(t, jnp.float32)
        fmaps = self.encoder(
            x, t, y=y, cond_img=cond_img, lsm_cond=lsm_cond, topo_cond=topo_cond, train=train
        )
        score = self.decoder(fmaps, t=t)
        std = self.marginal_prob_std(t).reshape((-1,) + (1,) * (score.ndim - 1))
        return (score.astype(jnp.float32) / std).astype(x.dtype)


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    """Static hyperparameters needed to rebuild the network (checkpointed)."""

    in_channels: int
    output_channels: int = 1
    time_embedding: int = 256
    last_fmap_channels: int = 512
    num_heads: int = 4
    block_layers: Tuple[int, ...] = (2, 2, 2, 2)
    num_classes: Optional[int] = None
    use_resize_conv: bool = True
    decoder_norm: str = "group"
    decoder_gn_groups: int = 8
    decoder_activation: str = "silu"
    attention_backend: str = "xla"
    compute_dtype: str = "float32"
    bn_axis_name: Optional[str] = None
    encoder_attn_stages: int = 2
    decoder_attn_blocks: int = 2
    # perf lowering knobs (identical math + params, different XLA programs;
    # measured winners on v5e are applied by inference_spec()):
    stem_impl: str = "direct"  # 'direct' | 's2d'
    fuse_upsample: str = "none"  # 'none' | 'dilated' | 'phases'
    fuse_head: bool = False  # fuse the linear final block into one conv


def inference_spec(spec: ModelSpec, image_hw: Optional[Tuple[int, int]] = None) -> ModelSpec:
    """Apply the measured per-shape lowering winners (docs/DESIGN.md 4a).

    All knobs are exact (identical params + outputs), so this only changes the
    XLA program. Measured on v5e (r2): at crop scale (<=256 px) the baseline
    program beats every alternative lowering; at full-domain scale the fused
    linear head wins (0.588 vs 0.704 s for the 608x800 EDM-18 scan, -16%) —
    its border-strip overhead is O(H+W) while the intermediates it removes
    grow O(H*W).
    """
    full_domain = image_hw is not None and min(image_hw) >= 512
    return dataclasses.replace(
        spec,
        stem_impl="direct",
        fuse_upsample="none",
        fuse_head=bool(full_domain),
    )


def build_score_model(spec: ModelSpec, sde=None) -> ScoreUNet:
    """Model factory (reference training_utils.py:597-669 get_model)."""
    from sbgm_danra_tpu.sde import VESDE

    sde = sde or VESDE()
    dtype = jnp.bfloat16 if spec.compute_dtype == "bfloat16" else jnp.float32
    # Derive the encoder pyramid from last_fmap_channels: 512 reproduces the
    # reference's fixed [64, 64, 128, 256, 512]; other values scale the model
    # coherently (the reference's encoder is hardwired to ResNet-18 widths, so
    # its last_fmap_channels sweep knob crashes any non-512 trial —
    # run_optuna.py prunes those on AssertionError).
    if spec.last_fmap_channels % 8 != 0:
        raise ValueError("last_fmap_channels must be divisible by 8")
    base = spec.last_fmap_channels // 8
    fmap_channels = (base, base, 2 * base, 4 * base, 8 * base)
    encoder = Encoder(
        time_embedding=spec.time_embedding,
        block_layers=tuple(spec.block_layers),
        n_heads=spec.num_heads,
        num_classes=spec.num_classes,
        fmap_channels=fmap_channels,
        attention_backend=spec.attention_backend,
        compute_dtype=dtype,
        bn_axis_name=spec.bn_axis_name,
        attn_stages=spec.encoder_attn_stages,
        stem_impl=spec.stem_impl,
    )
    decoder = Decoder(
        last_fmap_channels=spec.last_fmap_channels,
        output_channels=spec.output_channels,
        time_embedding=spec.time_embedding,
        first_fmap_channels=base,
        n_heads=spec.num_heads,
        use_resize_conv=spec.use_resize_conv,
        norm=spec.decoder_norm,
        gn_groups=spec.decoder_gn_groups,
        activation=spec.decoder_activation,
        attention_backend=spec.attention_backend,
        compute_dtype=dtype,
        attn_blocks=spec.decoder_attn_blocks,
        fuse_upsample=spec.fuse_upsample,
        fuse_head=spec.fuse_head,
    )
    return ScoreUNet(
        marginal_prob_std=sde.marginal_prob_std, encoder=encoder, decoder=decoder
    )
