"""Weight converters: HuggingFace / timm / fairseq checkpoints -> unilm_tpu params.

torch is imported lazily and only here (offline conversion); the compute path
never touches it. SURVEY.md §7 hard part 3: converters across three
serialization worlds with logit-parity tests.
"""
