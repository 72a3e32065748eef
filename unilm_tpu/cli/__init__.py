"""L6 CLI shims preserving the reference entry points (SURVEY.md §7):
run_class_finetuning (BEiT/DiT), run_funsd (LayoutLMv3), trocr_infer,
kosmos_infer. Each is `python -m unilm_tpu.cli.<name> --help`."""
