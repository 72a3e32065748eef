"""Shared building blocks: FFN, DropPath, LayerScale, init scaling.

Capability-equivalents of:
- kosmos-2/torchscale/torchscale/component/feedforward_network.py (FFN + subln)
- kosmos-2/torchscale/torchscale/component/droppath.py (stochastic depth)
- beit/modeling_finetune.py:169-181 (LayerScale gamma)
- torchscale deepnorm/subln init scaling (architecture/decoder.py:301-329)
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from unilm_tpu.core.config import TransformerConfig


def scaled_init(base: Callable, scale: float) -> Callable:
    """Wrap an initializer, multiplying samples by `scale`.

    Implements DeepNorm's init down-scale (divide by (8L)^1/4 → scale=1/s) and
    sub-LN's up-scale (multiply by sqrt(log 2L)) applied in the reference as a
    post-hoc parameter walk (decoder.py:301-329); here it is fused into init.
    """
    if scale == 1.0:
        return base

    def init(key, shape, dtype=jnp.float32):
        return base(key, shape, dtype) * scale

    return init


def default_kernel_init():
    return nn.initializers.xavier_uniform()


class DropPath(nn.Module):
    """Stochastic depth per sample (torchscale component/droppath.py)."""

    rate: float = 0.0
    deterministic: Optional[bool] = None

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: Optional[bool] = None) -> jax.Array:
        deterministic = nn.merge_param("deterministic", self.deterministic, deterministic)
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class LayerScale(nn.Module):
    """Learned per-channel residual scale gamma (beit/modeling_finetune.py:169)."""

    dim: int
    init_value: float = 1e-5
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        gamma = self.param(
            "gamma",
            nn.initializers.constant(self.init_value),
            (self.dim,),
            self.param_dtype,
        )
        return x * gamma.astype(x.dtype)


def get_activation(name: str, dtype=None) -> Callable:
    """Activation zoo. 'gelu' is exact erf-GELU (the torch default the
    reference uses everywhere), EXCEPT under bf16 compute: erf costs ~7
    extra VPU passes per element on TPU (measured: BEiT-B eval 2933 ->
    3683 img/s), while the tanh approximation's max deviation (~1e-3)
    is below one bf16 ulp at unit scale — numerically invisible at the
    compute precision. fp32 keeps exact erf (parity-grade).
    """
    import os as _os

    import jax.numpy as _jnp

    if (
        name == "gelu"
        and dtype == _jnp.bfloat16
        and not _os.environ.get("UNILM_TPU_EXACT_GELU")
    ):
        name = "gelu_tanh"
    return _get_activation_impl(name)


def _get_activation_impl(name: str) -> Callable:
    return {
        "gelu": lambda x: jax.nn.gelu(x, approximate=False),
        "gelu_tanh": lambda x: jax.nn.gelu(x, approximate=True),
        "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
        "relu": jax.nn.relu,
        "silu": jax.nn.silu,
        "swish": jax.nn.silu,
        "quick_gelu": lambda x: x * jax.nn.sigmoid(1.702 * x),
    }[name]


GATED_ACTIVATIONS = {"swiglu": "silu", "geglu": "gelu", "geglu_new": "gelu_new"}


def make_norm(cfg: TransformerConfig, name: str):
    """LayerNorm or T5/Pix2Struct-style RMSNorm by cfg.norm_type."""
    if cfg.norm_type == "rmsnorm":
        return nn.RMSNorm(
            epsilon=cfg.layernorm_eps, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            name=name,
        )
    return nn.LayerNorm(
        epsilon=cfg.layernorm_eps, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
        name=name,
    )


def make_dense(cfg: TransformerConfig, features: int, *, kernel_init, name: str):
    """Dense projection factory: int8 weight-only (ops/quant.QuantDense)
    when cfg.quant_weights, else nn.Dense. Quantized params are
    conversion-only (quantize_dense_tree); kernel_init is Dense-path-only."""
    if cfg.quant_weights:
        from unilm_tpu.ops.quant import QuantDense

        # Under a scanned stack the weight slice feeding a Pallas custom
        # call gets MATERIALIZED by XLA (dynamic-slice can't fuse into a
        # custom call: the int8 stream is paid twice — measured 439 vs
        # 923 GB/s effective). The XLA dequant-dot fuses slice+convert+dot
        # and runs at the int8 roofline, so scanned stacks use it.
        return QuantDense(features, use_bias=cfg.use_bias, dtype=cfg.dtype,
                          use_kernel=not cfg.scan_layers, name=name)
    return nn.Dense(
        features, kernel_init=kernel_init, use_bias=cfg.use_bias,
        dtype=cfg.dtype, param_dtype=cfg.param_dtype, name=name,
    )


class FeedForward(nn.Module):
    """fc1 -> act -> (inner LN if subln) -> fc2, or fused SwiGLU.

    Equivalent of torchscale FeedForwardNetwork
    (component/feedforward_network.py:93-131). `init_scale` carries the
    deepnorm/subln weight scaling for fc1/fc2.
    """

    cfg: TransformerConfig
    init_scale: float = 1.0

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        cfg = self.cfg
        kinit = scaled_init(default_kernel_init(), self.init_scale)
        dense = lambda feats, name: make_dense(cfg, feats, kernel_init=kinit, name=name)
        if cfg.activation in GATED_ACTIVATIONS:
            # gated FFN: (act(xW1) * xW3) W2 — SwiGLU / GeGLU; XLA fuses,
            # Pallas swiglu kernel covers the hot path.
            act = get_activation(GATED_ACTIVATIONS[cfg.activation], cfg.dtype)
            g = dense(cfg.ffn_dim, "fc1")(x)
            u = dense(cfg.ffn_dim, "fc3")(x)
            h = act(g) * u  # compute dtype (autocast semantics; fp32 when fp32)
        else:
            h = dense(cfg.ffn_dim, "fc1")(x)
            h = get_activation(cfg.activation, cfg.dtype)(h)
        h = nn.Dropout(cfg.activation_dropout)(h, deterministic=deterministic)
        if cfg.subln:
            h = make_norm(cfg, "ffn_layernorm")(h)
        h = dense(cfg.embed_dim, "fc2")(h)
        h = nn.Dropout(cfg.dropout)(h, deterministic=deterministic)
        return h
