"""BEV-grid CNN detector (the reference's dormant alternative branch).

Re-designs modules/neural_net/cnn/* ("NOTE: not used in the current
version" but a full capability): ResNet-ish bottleneck backbone over the
[X, Y, 3] likelihood/range/azimuth image, FPN-style top-down neck fused
with the raw image, and a per-cell head that augments features with
normalised (vr, rcs) before classifying every grid cell and regressing
offsets.  Layout is NHWC (TPU-native); norms are the scalar-affine
channel norm over the channel axis (common.py channel_normalization on
(N,C,H,W) dim 1 ≡ the last axis here) or weight-standardised conv +
GroupNorm(16) (common.py:12-59).

Deviation from the reference: the head computes logits for ALL cells and
the loss masks invalid ones (the reference dynamically gathers valid
cells, head.py:229-250 — a dynamic shape XLA can't compile).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..data.labels import INVALID_NUM
from .blocks import CLS_BIAS, HEAD_STD, activation_fn

_NUM_GROUPS = 16  # constants.py:11


@dataclasses.dataclass
class CNNConfig:
    """configuration_radarscenes_cnn.yml CNN_ARCHITECTURE defaults."""

    input_image_dimension: int = 3
    base_stem_channels: Sequence[int] = (32, 64)
    base_kernel_sizes: Sequence[int] = (11, 7)
    bottleneck_number_of_blocks: Sequence[int] = (2, 2, 2, 2)
    bottleneck_stem_channels: Sequence[int] = (128, 256, 512, 1024)
    bottleneck_width_channels: int = 64
    bottleneck_kernel_size: int = 3
    neck_out_channels: int = 64
    neck_kernel_size: int = 3
    head_stem_channels: Sequence[int] = (64,)
    head_ffn_channels: Sequence[int] = (64,)
    head_kernel_size: int = 3
    reg_offset_dim: int = 2
    num_classes: int = 8  # full taxonomy incl. STATIC (set_config_cnn)
    activation: str = "leakyrelu"
    conv_type: str = "conv2d"
    reg_mu: Tuple[float, float] = (0.0, 0.0)
    reg_sigma: Tuple[float, float] = (8.0, 4.0)
    cls_loss_weight: float = 1.0
    reg_loss_weight: float = 10.0
    class_weights: Sequence[float] = (1.0,) * 6 + (0.5, 0.5)
    learning_rate: float = 0.001
    weight_decay: float = 1e-4
    momentum: float = 0.9
    max_train_iter: int = 100_000


def channel_norm_nhwc(x, gamma, beta, eps=1e-5):
    """Scalar-affine channel norm over the channel (last) axis, Bessel std
    — common.py:208-220 applied to conv maps."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    n = x.shape[-1]
    var = jnp.sum((x - mean) ** 2, axis=-1, keepdims=True) / max(n - 1, 1)
    return gamma * ((x - mean) / (jnp.sqrt(var) + eps)) + beta


class ConvBlock(nn.Module):
    """conv → channel norm → act (common.py conv_nxn_block)."""

    features: int
    kernel_size: int
    stride: int = 1
    activation: str = "leakyrelu"
    use_norm: bool = True

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding="SAME",
        )(x)
        if self.use_norm:
            gamma = self.param("gamma", nn.initializers.ones, (1,))
            beta = self.param("beta", nn.initializers.zeros, (1,))
            x = channel_norm_nhwc(x, gamma, beta)
        return activation_fn(self.activation)(x)


class WSConvBlock(nn.Module):
    """Weight-standardised conv + GroupNorm(16) + act
    (common.py ws_conv_nxn_block)."""

    features: int
    kernel_size: int
    stride: int = 1
    activation: str = "leakyrelu"

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (k, k, cin, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        # standardise over (kh, kw, cin) per output channel with Bessel std
        # (common.py:52-58 uses torch.std)
        flat = kernel.reshape(-1, self.features)
        mean = jnp.mean(flat, axis=0, keepdims=True)
        n = flat.shape[0]
        var = jnp.sum((flat - mean) ** 2, axis=0, keepdims=True) / max(
            n - 1, 1
        )
        std_kernel = ((flat - mean) / (jnp.sqrt(var) + 1e-5)).reshape(
            kernel.shape
        )
        out = jax.lax.conv_general_dilated(
            x, std_kernel,
            window_strides=(self.stride, self.stride),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias
        out = nn.GroupNorm(num_groups=_NUM_GROUPS, epsilon=1e-5)(out)
        return activation_fn(self.activation)(out)


class Bottleneck(nn.Module):
    """1x1 → kxk(, stride) → 1x1 with channel-normed 1x1 projector
    (backbone.py:41-95)."""

    out_channels: int
    width: int
    kernel_size: int
    stride: int
    activation: str

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        if in_ch != self.out_channels or self.stride != 1:
            identity = nn.Conv(
                self.out_channels, (1, 1),
                strides=(self.stride, self.stride),
            )(x)
            gamma = self.param("proj_gamma", nn.initializers.ones, (1,))
            beta = self.param("proj_beta", nn.initializers.zeros, (1,))
            identity = channel_norm_nhwc(identity, gamma, beta)
        else:
            identity = x
        out = ConvBlock(self.width, 1, 1, self.activation)(x)
        out = ConvBlock(
            self.width, self.kernel_size, self.stride, self.activation
        )(out)
        out = ConvBlock(self.out_channels, 1, 1, self.activation)(out)
        return out + identity


class Backbone(nn.Module):
    """base (stride-2 stem) + 4 stride-2 bottleneck stages → pyramid dict
    (backbone.py:136-177)."""

    cfg: CNNConfig

    @nn.compact
    def __call__(self, image):
        c = self.cfg
        feats = {}
        x = image
        for i, (ch, k) in enumerate(
            zip(c.base_stem_channels, c.base_kernel_sizes)
        ):
            x = ConvBlock(ch, k, 2 if i == 0 else 1, c.activation)(x)
        feats["c0"] = x
        for si, (nblk, ch) in enumerate(
            zip(c.bottleneck_number_of_blocks, c.bottleneck_stem_channels)
        ):
            for b in range(nblk):
                x = Bottleneck(
                    ch, c.bottleneck_width_channels,
                    c.bottleneck_kernel_size,
                    2 if b == 0 else 1, c.activation,
                )(x)
            feats[f"c{si + 1}"] = x
        return feats


def _resize(x, hw):
    return jax.image.resize(
        x, (x.shape[0],) + tuple(hw) + (x.shape[-1],), method="bilinear"
    )


class Neck(nn.Module):
    """Top-down FPN-ish aggregation fused with the raw image
    (aggregation.py:14-112)."""

    cfg: CNNConfig

    @nn.compact
    def __call__(self, feats, image):
        c = self.cfg
        n = len(feats)
        reduced = {
            key: ConvBlock(
                c.neck_out_channels, c.neck_kernel_size, 1, c.activation,
                name=f"reduce_{key}",
            )(val)
            for key, val in feats.items()
        }
        keys = [f"c{n - 1 - i}" for i in range(n)]  # top → bottom
        cur = keys[0]
        nxt = keys[1]
        x = _resize(reduced[cur], reduced[nxt].shape[1:3])
        x = ConvBlock(
            c.neck_out_channels, c.neck_kernel_size, 1, c.activation,
            name=f"fuse_{cur}",
        )(x)
        for i in range(1, n - 1):
            cur, nxt = keys[i], keys[i + 1]
            x = jnp.concatenate([x, reduced[cur]], axis=-1)
            x = _resize(x, reduced[nxt].shape[1:3])
            x = ConvBlock(
                c.neck_out_channels, c.neck_kernel_size, 1, c.activation,
                name=f"fuse_{cur}",
            )(x)
        cur = keys[-1]
        x = jnp.concatenate([x, reduced[cur]], axis=-1)
        x = _resize(x, image.shape[1:3])
        x = ConvBlock(
            c.neck_out_channels, c.neck_kernel_size, 1, c.activation,
            name=f"fuse_{cur}",
        )(x)
        x = jnp.concatenate([x, image], axis=-1)
        return ConvBlock(
            c.neck_out_channels, c.neck_kernel_size, 1, c.activation,
            name="fuse_image",
        )(x)


def normalize_vr_rcs(vr, rcs):
    """head.py:253-259 dataset normalisation constants."""
    return (vr + 107.0) / 220.0, (rcs + 31.0) / 79.0


class HeadV2(nn.Module):
    """Per-cell FFN head over conv stem + (vr, rcs) augmentation
    (head.py:184-250); computed densely, masked in the loss."""

    cfg: CNNConfig

    @nn.compact
    def __call__(self, x, vr_grid, rcs_grid):
        c = self.cfg
        for ch in c.head_stem_channels:
            x = ConvBlock(ch, c.head_kernel_size, 1, c.activation)(x)
        vr, rcs = normalize_vr_rcs(vr_grid, rcs_grid)
        x = jnp.concatenate(
            [x, vr[..., None], rcs[..., None]], axis=-1
        )
        # FFNStemBlock: Dense + act, no norm (head.py:45-66)
        for ch in c.head_ffn_channels:
            x = nn.Dense(ch)(x)
            x = activation_fn(c.activation)(x)
        stem = x
        cls_in = nn.Dense(stem.shape[-1])(stem)
        cls_in = activation_fn(c.activation)(cls_in)
        cls = nn.Dense(
            c.num_classes,
            kernel_init=nn.initializers.normal(HEAD_STD),
            bias_init=nn.initializers.constant(CLS_BIAS),
        )(cls_in)
        reg_in = nn.Dense(stem.shape[-1])(stem)
        reg_in = activation_fn(c.activation)(reg_in)
        reg = nn.Dense(
            c.reg_offset_dim,
            kernel_init=nn.initializers.normal(HEAD_STD),
            bias_init=nn.initializers.zeros,
        )(reg_in)
        return cls, reg


class GridOutputs(NamedTuple):
    cls: jnp.ndarray  # [B, X, Y, num_classes]
    reg: jnp.ndarray  # [B, X, Y, 2]


class GridDetector(nn.Module):
    """Backbone → Neck → HeadV2 (set_param_for_training_cnn wiring)."""

    cfg: CNNConfig

    @nn.compact
    def __call__(self, image, vr_grid, rcs_grid) -> GridOutputs:
        feats = Backbone(self.cfg)(image)
        x = Neck(self.cfg)(feats, image)
        cls, reg = HeadV2(self.cfg)(x, vr_grid, rcs_grid)
        return GridOutputs(cls, reg)


def grid_loss(
    out: GridOutputs,
    gt_label_grid,   # [B, X, Y] float with INVALID_NUM in empty cells
    gt_offset_grid,  # [B, X, Y, 2]
    cfg: CNNConfig,
    static_id: int = 7,
    false_id: int = 6,
):
    """Loss_Grid (cnn/loss.py:11-68): weighted CE over valid cells, 0.5·MSE
    over valid dynamic-object cells, weights 1.0/10.0."""
    cw = jnp.asarray(cfg.class_weights, jnp.float32)
    valid_cell = gt_label_grid != INVALID_NUM
    labels = jnp.where(valid_cell, gt_label_grid, 0.0).astype(jnp.int32)
    valid_obj = (
        valid_cell
        & (labels != static_id)
        & (labels != false_id)
    )

    onehot = jax.nn.one_hot(labels, cfg.num_classes)
    logp = jax.nn.log_softmax(out.cls, axis=-1)
    nll = -jnp.sum(onehot * logp, axis=-1) * cw[labels]
    n_cell = jnp.sum(valid_cell)
    cls_loss = jnp.where(
        n_cell > 0,
        jnp.sum(jnp.where(valid_cell, nll, 0.0)) / jnp.maximum(n_cell, 1),
        0.0,
    )

    mu = jnp.asarray(cfg.reg_mu)
    sigma = jnp.asarray(cfg.reg_sigma)
    gt_norm = (gt_offset_grid - mu) / sigma
    se = 0.5 * jnp.sum((out.reg - gt_norm) ** 2, axis=-1)
    n_obj = jnp.sum(valid_obj)
    reg_loss = jnp.where(
        n_obj > 0,
        jnp.sum(jnp.where(valid_obj, se, 0.0)) / jnp.maximum(n_obj, 1),
        0.0,
    )
    total = (
        cls_loss * cfg.cls_loss_weight + reg_loss * cfg.reg_loss_weight
    )
    return total, {
        "loss_cls": cls_loss * cfg.cls_loss_weight,
        "loss_reg": reg_loss * cfg.reg_loss_weight,
        "loss_total": total,
    }


def make_grid_train_step(cfg: CNNConfig):
    import optax

    from ..train.steps import TrainState, all_finite, apply_if

    model = GridDetector(cfg)
    tx = optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),
        optax.sgd(cfg.learning_rate, momentum=cfg.momentum),
    )

    def init(rng, image, vr, rcs):
        params = model.init(rng, image, vr, rcs)["params"]
        return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))

    def loss_fn(params, image, vr, rcs, label_grid, offset_grid):
        out = model.apply({"params": params}, image, vr, rcs)
        return grid_loss(out, label_grid, offset_grid, cfg)

    @jax.jit
    def step(state, image, vr, rcs, label_grid, offset_grid):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, image, vr, rcs, label_grid, offset_grid
        )
        ok = all_finite(grads) & jnp.isfinite(loss)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        params, opt_state = apply_if(
            ok, (params, opt_state), (state.params, state.opt_state)
        )
        metrics = dict(metrics, skipped=(~ok).astype(jnp.float32))
        return TrainState(params, opt_state, state.step + 1), metrics

    return model, init, step, loss_fn
