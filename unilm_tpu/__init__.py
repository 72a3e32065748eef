"""unilm_tpu — a TPU-native JAX framework with the capabilities of microsoft/unilm.

One shared Magneto/TorchScale-style transformer core (cf. reference
kosmos-2/torchscale/torchscale/architecture/{encoder,decoder}.py) serving:

- BEiT / BEiT-2 / DiT  (vision transformers, 2D relative position bias)
- LayoutLMv3           (text + 2D layout + image patches)
- TrOCR                (OCR encoder-decoder with beam search)
- Kosmos-2 / Kosmos-2.5 (grounded multimodal LLM decode)
- BEiT-3               (Multiway multimodal encoder)

plus a fairseq-equivalent runtime: pjit/GSPMD-sharded training (DP/FSDP/TP/EP
over a device mesh), an HBM-resident-KV generation engine with static-shape
beam search, checkpointable streaming data, and HF/timm weight converters.

Compute path is jax/XLA/Pallas; nothing here imports torch (torch is used
only in tests and offline weight converters).
"""

__version__ = "0.1.0"
