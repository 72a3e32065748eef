"""Model & architecture registry.

Equivalent of fairseq's @register_model / @register_model_architecture
(trocr/trocr_models.py:34, kosmos-2/unilm/models/unigpt.py:478-525, timm
@register_model in beit/modeling_finetune.py:378): one place that maps
architecture names to (config factory, model class) so CLIs and user code
build any model by name:

    cfg, model = registry.build("beit_base_patch16_224", num_classes=10)
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

_ARCHS: Dict[str, Tuple[Callable, Any]] = {}


def register(name: str, config_fn: Callable, model_cls) -> None:
    if name in _ARCHS:
        raise ValueError(f"duplicate arch {name!r}")
    _ARCHS[name] = (config_fn, model_cls)


def names():
    return sorted(_ARCHS)


def build(name: str, **config_overrides):
    """Returns (config, model_instance)."""
    if name not in _ARCHS:
        raise KeyError(f"unknown architecture {name!r}; known: {names()}")
    config_fn, model_cls = _ARCHS[name]
    cfg = config_fn(**config_overrides)
    return cfg, model_cls(cfg)


def _populate():
    from unilm_tpu.models import beit as B
    from unilm_tpu.models import beit3 as B3
    from unilm_tpu.models import kosmos as K
    from unilm_tpu.models import layoutlm as L1
    from unilm_tpu.models import layoutlmv2 as L2
    from unilm_tpu.models import layoutlmv3 as L3
    from unilm_tpu.models import markuplm as M
    from unilm_tpu.models import trocr as T
    from unilm_tpu.models import retnet as RN
    from unilm_tpu.models import translation as XT
    from unilm_tpu.models import yoco as Y
    from unilm_tpu.models.diff_transformer import DiffTransformerConfig, DiffTransformerLM
    from unilm_tpu.models.retrieval import EmbeddingModel, TextEncoderConfig
    from unilm_tpu.models.unilm_s2s import UniLMConfig, UniLMForSeq2Seq
    from unilm_tpu.models.wavlm import WavLMConfig, WavLMModel

    for n in ("beit_base_patch16_224", "beit_base_patch16_384",
              "beit_large_patch16_224", "beit_large_patch16_384",
              "beit_large_patch16_512", "dit_base_patch16_224",
              "dit_large_patch16_224"):
        register(n, getattr(B, n), B.BeitForImageClassification)

    register("beit3_base", B3.beit3_base, B3.BEiT3ForImageClassification)
    register("beit3_large", B3.beit3_large, B3.BEiT3ForImageClassification)

    register("layoutlm_base", L1.LayoutLMConfig, L1.LayoutLMForTokenClassification)
    register("layoutlmv2_base", L2.LayoutLMv2Config, L2.LayoutLMv2ForTokenClassification)
    register("layoutlmv3_base", L3.layoutlmv3_base, L3.LayoutLMv3ForTokenClassification)
    register("layoutlmv3_large", L3.layoutlmv3_large, L3.LayoutLMv3ForTokenClassification)
    register("markuplm_base", M.MarkupLMConfig, M.MarkupLMForTokenClassification)

    register("trocr_small", T.trocr_small, T.TrOCRModel)
    register("trocr_base", T.trocr_base, T.TrOCRModel)
    register("trocr_large", T.trocr_large, T.TrOCRModel)

    register("kosmos2", K.kosmos2, K.UniGPT)
    register("kosmos2_5", K.kosmos2_5, K.UniGPT)

    register("yoco_base", Y.YOCOConfig, Y.YOCO)
    register("retnet_base", RN.retnet_base, RN.RetNetDecoder)
    register("retnet_medium", RN.retnet_medium, RN.RetNetDecoder)
    register("xlmt_base", XT.xlmt_base, XT.MultilingualTranslationModel)
    register("xlmt_big", XT.xlmt_big, XT.MultilingualTranslationModel)
    register("diff_transformer_base", DiffTransformerConfig, DiffTransformerLM)
    register("unilm_seq2seq_base", UniLMConfig, UniLMForSeq2Seq)
    register("wavlm_base", WavLMConfig, WavLMModel)
    register("e5_base", TextEncoderConfig, EmbeddingModel)


_populate()
