"""jax.export deployment-artifact tests (the --torchscript analogue)."""
import numpy as np

import jax.numpy as jnp

from megatron_clip_tpu.factory import create_model
from megatron_clip_tpu.inference.export import (
    export_clip, load_exported, save_exported)


def test_export_roundtrip(tmp_path):
    model, params = create_model("test-tiny", precision="fp32", seed=0)
    arts = export_clip(model, params, batch_size=2)
    assert set(arts) == {"encode_image", "encode_text", "forward"}
    save_exported(arts, tmp_path / "blob")
    fns = load_exported(tmp_path / "blob")

    imgs = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3),
                       jnp.float32)
    txts = jnp.asarray(np.random.RandomState(1).randint(1, 49000, (2, 32)),
                       jnp.int32)
    ref = np.asarray(model.encode_image(params, imgs))
    out = np.asarray(fns["encode_image"](imgs))
    np.testing.assert_allclose(out, ref, atol=1e-5)
    fi, ft, scale = fns["forward"](imgs, txts)
    np.testing.assert_allclose(np.asarray(fi), ref, atol=1e-5)
    assert float(scale) > 0
