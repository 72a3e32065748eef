"""Unified transformer configuration.

Capability-equivalent of torchscale's EncoderConfig/DecoderConfig
(reference: kosmos-2/torchscale/torchscale/architecture/config.py:19-206)
re-designed as a single frozen dataclass. The reference keeps two mutable
kwargs-objects with an `override(args)` merge; here one typed config drives
both `Encoder` and `Decoder`, and per-model presets live in
`unilm_tpu/models/*` (the `@register_model_architecture` pattern,
cf. kosmos-2/unilm/models/unigpt.py:478-525).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class TransformerConfig:
    # --- dimensions -------------------------------------------------------
    vocab_size: int = 0
    embed_dim: int = 768
    ffn_dim: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    head_dim: Optional[int] = None  # default embed_dim // num_heads

    # --- regularization ---------------------------------------------------
    dropout: float = 0.0
    attention_dropout: float = 0.0
    activation_dropout: float = 0.0
    drop_path_rate: float = 0.0

    # --- architecture switches (Magneto core) ------------------------------
    activation: str = "gelu"  # gelu | relu | swiglu | geglu | geglu_new
    normalize_before: bool = True  # pre-LN (False = post-LN)
    deepnorm: bool = False  # DeepNorm residual scaling + init down-scale
    subln: bool = False  # Magneto sub-LayerNorm + init up-scale
    bert_init: bool = False
    multiway: bool = False  # modality-split FFN/LN (BEiT-3)
    layernorm_eps: float = 1e-5
    norm_type: str = "layernorm"  # layernorm | rmsnorm (T5/Pix2Struct style)
    use_bias: bool = True  # False: bias-free projections (T5/Pix2Struct)
    attn_scale: Optional[float] = None  # None = head_dim**-0.5; T5 uses 1.0

    # --- positional schemes -------------------------------------------------
    rel_pos_buckets: int = 0  # T5 bucketed relative bias (0 = off)
    max_rel_pos: int = 0
    xpos_rel_pos: bool = False  # xPos/SoPE rotary
    xpos_scale_base: int = 512
    scale_length: int = 2048  # length-extrapolation attention rescale

    # --- embedding front-end -------------------------------------------------
    max_positions: int = 1024
    learned_pos: bool = True
    no_scale_embedding: bool = True  # if False multiply embed by sqrt(dim)
    layernorm_embedding: bool = False
    share_input_output_embed: bool = False
    no_output_layer: bool = False

    # --- MoE (X-MoE equivalent) ----------------------------------------------
    moe_freq: int = 0  # every Nth layer is MoE (0 = dense)
    moe_experts: int = 0
    moe_top: int = 2  # 1 = Top1Gate, 2 = Top2Gate
    moe_capacity_factor: float = 1.0
    moe_eval_capacity_factor: float = 2.0
    moe_gate_dim: int = 0  # xMoE low-dim routing projection (0 = off)
    moe_second_expert_policy: str = "random"

    # --- attention implementation ----------------------------------------------
    remat: bool = False  # activation checkpointing per layer (fairseq
    # --checkpoint-activations / torchscale checkpoint_wrapper, decoder.py:351)
    remat_policy: str = "full"  # 'full' = recompute everything (lowest
    # memory); 'dots' = jax dots_with_no_batch_dims_saveable — keep matmul
    # outputs, recompute only elementwise (higher MFU, ~2x activation memory)
    use_flash: bool = True  # Pallas flash attention when on TPU
    # Sequence/context parallelism: name of the mesh axis the sequence is
    # sharded over. When set, the model must run under shard_map with the
    # T dim split on this axis; self-attention routes through the
    # flash-chunk ring (parallel/ring_attention.ring_attention_flash) and
    # xPos uses global positions. The long-context training path
    # (LongNet/YOCO envelope) — lets a step whose activations exceed one
    # chip train across the ring. See parallel/long_context.py.
    # SCOPE (COVERAGE.md §2.9): self-attention, with or without a
    # key-padding mask — the [B, Tl] kpm shard rotates the ring with its
    # K/V chunk, so ragged long-document ENCODER workloads can use the seq
    # axis too (round 5). ADDITIVE attention biases remain unsupported
    # (each traveling chunk would need its [T, S_chunk] bias slice in both
    # ring passes); biased workloads stay on the dense/flash path.
    seq_axis: Any = None  # Optional[str]
    window_size: int = 0  # sliding-window attention (0 = full)
    flash_block_q: int = 512
    flash_block_k: int = 1024
    quant_weights: bool = False  # int8 weight-only projections (serving/
    # decode; conversion-only — see ops/quant.py). The reference serves in
    # fp16 (kosmos-2.5/inference.py:132); this halves the decode HBM stream.
    kv_cache_dtype: str = "model"  # "model" | "int8": per-token symmetric
    # int8 KV in the scan_layers decode pool (ops/paged_attention
    # quantize_kv_rows + scale sidecar). Halves the slab stream — the
    # cache read is the biggest ctx-dependent decode cost — and doubles
    # KV capacity; logit error ~1e-2-class (below bf16 decode noise).
    scan_layers: bool = False  # run the homogeneous layer stack as ONE
    # lax.scan over axis-0-stacked per-layer params instead of a Python
    # loop. Decode-path dispatch killer: a 24-layer bs=1 decode step is
    # 600+ tiny ops when unrolled (per-op scheduling gaps dominate the
    # weight-stream roofline); scanned, XLA compiles ONE loop body.
    # Requires uniform layers: moe_freq == 0 and drop_path_rate == 0.
    # Param tree: `layers` stacked on axis 0 (convert a looped tree with
    # core.transformer.stack_layer_params). Cache leaves stack on AXIS 1
    # ([B, L, S, H, D]) so generation's batch-axis beam gather is unchanged.

    # --- compute dtypes ----------------------------------------------------------
    dtype: Any = jnp.float32  # activation dtype (bf16 for perf)
    param_dtype: Any = jnp.float32

    # --- encoder-decoder ---------------------------------------------------------
    is_encoder_decoder: bool = False

    def __post_init__(self):
        if self.deepnorm and self.subln:
            raise ValueError("deepnorm and subln are mutually exclusive")
        if self.deepnorm and self.normalize_before:
            # DeepNorm is a post-LN scheme (config.py:183-189 in reference).
            object.__setattr__(self, "normalize_before", False)
        if self.subln and not self.normalize_before:
            object.__setattr__(self, "normalize_before", True)
        if self.head_dim is None:
            object.__setattr__(self, "head_dim", self.embed_dim // self.num_heads)

    # convenience -----------------------------------------------------------
    def replace(self, **kw) -> "TransformerConfig":
        return dataclasses.replace(self, **kw)

    @property
    def deepnorm_alpha(self) -> float:
        """Residual scale for DeepNorm (decoder.py:301-313 in reference)."""
        if not self.deepnorm:
            return 1.0
        if self.is_encoder_decoder:
            # decoder alpha in enc-dec setting (decoder.py:90); the encoder side
            # uses 0.81*(N^4*M)^(1/16) (encoder.py:77-83) — handled by Encoder.
            return float(3 * self.num_layers) ** 0.25
        return float(2 * self.num_layers) ** 0.25

    @property
    def deepnorm_init_div(self) -> float:
        if not self.deepnorm:
            return 1.0
        if self.is_encoder_decoder:
            return float(12 * self.num_layers) ** 0.25
        return float(8 * self.num_layers) ** 0.25

    @property
    def subln_init_mul(self) -> float:
        """Init up-scale for sub-LN (decoder.py:315-329 in reference)."""
        if not self.subln:
            return 1.0
        import math

        if self.is_encoder_decoder:
            return math.sqrt(math.log(3 * self.num_layers))
        return math.sqrt(math.log(2 * self.num_layers))
