"""Precision-policy mapping (open_CLIP --precision values, params.py /
main.py:281-287): bf16/amp keep fp32 master params with bf16 compute;
pure_bf16 stores the weights themselves in bf16 (halves param + optimizer
HBM — the config that fits ViT-H on one 16G chip)."""
import jax
import jax.numpy as jnp
import pytest

from megatron_clip_tpu.factory import create_model


def _dtypes(params):
    return {str(x.dtype) for x in jax.tree.leaves(params)}


def test_bf16_keeps_fp32_master_params():
    _, p = create_model("test-tiny", precision="bf16")
    assert _dtypes(p) == {"float32"}


def test_pure_bf16_stores_bf16_weights():
    m, p = create_model("test-tiny", precision="pure_bf16")
    dts = _dtypes(p)
    assert "bfloat16" in dts
    # only the scalar logit_scale temperature stays fp32
    fp32 = [path for path, leaf in jax.tree_util.tree_flatten_with_path(p)[0]
            if leaf.dtype == jnp.float32]
    assert len(fp32) == 1
    out = m(p, jnp.zeros((2, m.image_size, m.image_size, 3)),
            jnp.zeros((2, m.context_length), jnp.int32))
    assert out["image_features"].dtype == jnp.float32
    assert bool(jnp.all(jnp.isfinite(out["image_features"])))


def test_unknown_precision_raises():
    with pytest.raises(ValueError):
        create_model("test-tiny", precision="int4")
