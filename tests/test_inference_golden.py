"""Golden-feature inference regression (open_CLIP tests/util_test.py
pattern): seeded inputs through encode_image/encode_text compared against
committed expected outputs — catches any numerics drift in the towers."""
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN = Path(__file__).parent / "functional" / "expected" / "features_test-tiny.json"


def _compute():
    from megatron_clip_tpu.factory import create_model
    model, params = create_model("test-tiny", precision="fp32", seed=7)
    k = jax.random.PRNGKey(11)
    images = jax.random.normal(k, (2, 32, 32, 3))
    texts = jax.random.randint(jax.random.PRNGKey(13), (2, 32), 1, 49000)
    out = model(params, images, texts.astype(jnp.int32))
    return {
        "image_features": np.asarray(out["image_features"][:, :8]).tolist(),
        "text_features": np.asarray(out["text_features"][:, :8]).tolist(),
    }


def test_encode_features_golden():
    got = _compute()
    if not GOLDEN.is_file():
        GOLDEN.write_text(json.dumps(got, indent=1))
        pytest.skip("wrote new feature goldens")
    want = json.loads(GOLDEN.read_text())
    for key in ("image_features", "text_features"):
        np.testing.assert_allclose(np.asarray(got[key]),
                                   np.asarray(want[key]),
                                   rtol=1e-4, atol=1e-5, err_msg=key)
