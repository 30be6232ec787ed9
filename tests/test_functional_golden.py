"""Golden-loss functional regression (the reference's 50-step CI design,
tests/functional_tests/python_test_utils/test_ci_pipeline.py) at test-suite
scale: deterministic tiny runs per parallel config vs committed goldens."""
import json
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent / "functional"))
from run_functional import (  # noqa: E402
    CONFIGS, GPT_CONFIGS, EXPECTED_DIR, LOSS_MARGIN, run_config)


@pytest.mark.parametrize("name", list(CONFIGS) + list(GPT_CONFIGS))
def test_golden_loss(name, devices8):
    path = EXPECTED_DIR / f"{name}.json"
    if not path.is_file():
        pytest.skip(f"no golden for {name}; run run_functional.py --update")
    want = json.loads(path.read_text())["final_loss"]
    got = run_config(name)["final_loss"]
    rel = abs(got - want) / max(abs(want), 1e-9)
    assert rel <= LOSS_MARGIN, (name, got, want, rel)
