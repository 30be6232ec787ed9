"""int8 quantized matmul tests (the TPU-native TransformerEngine/fp8
equivalent, ops/quant.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from megatron_clip_tpu.ops.quant import (
    dequantize_params, int8_matmul, quant_dense, quantize_params,
    quantize_symmetric)


def test_quantize_roundtrip_error_bound():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 32))
    q, scale = quantize_symmetric(w, axis=0)
    assert q.dtype == jnp.int8
    deq = q.astype(jnp.float32) * scale
    # quantization step = scale; max error 0.5 * scale per element
    err = np.abs(np.asarray(deq - w))
    assert (err <= 0.5 * np.asarray(scale) + 1e-7).all()


def test_int8_matmul_close_to_fp32():
    kx, kw = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(kx, (4, 16, 64))
    w = jax.random.normal(kw, (64, 32))
    q, scale = quantize_symmetric(w, axis=0)
    out = int8_matmul(x, q, scale)
    ref = x @ w
    rel = np.abs(np.asarray(out - ref)).mean() / np.abs(np.asarray(ref)).mean()
    assert rel < 0.02, rel    # ~1% relative error at int8


def test_ste_gradients_are_full_precision():
    kx, kw = jax.random.split(jax.random.PRNGKey(2))
    x = jax.random.normal(kx, (8, 64))
    w = jax.random.normal(kw, (64, 32))
    gx, gw = jax.grad(lambda x, w: (quant_dense(x, w) ** 2).sum(),
                      argnums=(0, 1))(x, w)
    # STE: gradients computed with the *unquantized* weight/activation
    out = quant_dense(x, w)   # forward value enters the cotangent
    g = 2 * out
    np.testing.assert_allclose(np.asarray(gx), np.asarray(g @ w.T),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(x.T @ g),
                               rtol=1e-4, atol=1e-4)


def test_gpt_trains_with_int8_mlp():
    from pretrain_gpt import parse_args, run
    m = run(parse_args([
        "--num-layers", "2", "--hidden-size", "64", "--num-heads", "4",
        "--seq-length", "32", "--vocab-size", "256", "--batch-size", "8",
        "--train-steps", "10", "--warmup", "2", "--precision", "fp32",
        "--log-interval", "10", "--quantize-matmuls", "int8"]))
    assert np.isfinite(m["loss"]) and m["loss"] < 6.0


def test_quantize_params_serving():
    params = {"w": jax.random.normal(jax.random.PRNGKey(3), (128, 64)),
              "bias": jnp.zeros((64,)),
              "nested": {"w2": jax.random.normal(jax.random.PRNGKey(4),
                                                 (4, 128, 64))}}
    qp = quantize_params(params, min_size=1024)
    assert qp["w"]["q"].dtype == jnp.int8
    assert qp["bias"].dtype == jnp.float32          # too small / 1-D: kept
    dq = dequantize_params(qp)
    rel = (np.abs(np.asarray(dq["nested"]["w2"] - params["nested"]["w2"])).max()
           / np.abs(np.asarray(params["nested"]["w2"])).max())
    assert rel < 0.01
