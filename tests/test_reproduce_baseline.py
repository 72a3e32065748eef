"""Golden-number harness plumbing (cli/reproduce_baseline.py --smoke).

The real golden numbers need published checkpoints + datasets (absent in
this environment); these tests prove each config's eval loop runs end to
end on synthetic fixtures and emits a well-formed verdict.
"""

import pytest

from unilm_tpu.cli import reproduce_baseline


@pytest.mark.parametrize("config", ["trocr_iam", "funsd", "kosmos_ocr",
                                    "beit_base_eval"])
def test_smoke(config):
    v = reproduce_baseline.main(["--config", config, "--smoke"])
    assert v["config"] == config and v["smoke"] is True
    assert isinstance(v["measured"], float)
    assert v["golden"] == reproduce_baseline.GOLDEN[config]["value"]
