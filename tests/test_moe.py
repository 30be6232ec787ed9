"""SwitchMLP MoE tests: routing/capacity correctness, balance losses, EP
sharding parity (reference: megatron SwitchMLP + expert-parallel groups)."""
import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from megatron_clip_tpu.config import TransformerCfg, ParallelCfg
from megatron_clip_tpu.ops.moe import init_switch_mlp, apply_switch_mlp, sinkhorn
from megatron_clip_tpu.nn.transformer import init_transformer, apply_transformer

MOE_CFG = TransformerCfg(layers=2, width=64, heads=4, num_experts=4)


def test_switch_mlp_shapes_and_aux():
    p = init_switch_mlp(jax.random.PRNGKey(0), 64, 256, 4)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 64))
    y, aux = apply_switch_mlp(p, x, capacity_factor=2.0)
    assert y.shape == x.shape
    # balanced-ish random routing => aux close to 1 (perfect balance == 1)
    assert 0.5 < float(aux) < 4.0


def test_moe_swiglu_trains():
    """--swiglu --num-experts is a valid megatron combo: expert fc width
    doubles (value+gate) and the swiglu split applies per expert."""
    cfg = dataclasses.replace(MOE_CFG, act="swiglu")
    blocks = init_transformer(jax.random.PRNGKey(0), cfg)
    # gate halves: expert w1 out dim is 2*mlp_hidden, w2 in dim mlp_hidden
    assert blocks["moe"]["w1"].shape[-1] == 2 * cfg.mlp_hidden
    assert blocks["moe"]["w2"].shape[-2] == cfg.mlp_hidden
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 64))
    y, aux = apply_transformer(blocks, x, cfg)
    assert y.shape == x.shape and np.isfinite(np.asarray(y)).all()
    g = jax.grad(lambda b: jnp.sum(
        apply_transformer(b, x, cfg)[0] ** 2))(blocks)
    assert np.isfinite(np.asarray(g["moe"]["w1"])).all()


def test_moe_eval_routing_batch_independent():
    """At eval (train=False) routing is per-token argmax: a token's expert
    must not depend on what else is in the batch (megatron switch_mlp.py
    not-self.training semantics; sinkhorn is batch-dependent)."""
    cfg = dataclasses.replace(MOE_CFG, train=False)
    blocks = init_transformer(jax.random.PRNGKey(0), cfg)
    xa = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 64))
    xb = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 64))
    solo, _ = apply_transformer(blocks, xa, cfg)
    both, _ = apply_transformer(blocks, jnp.concatenate([xa, xb]), cfg)
    np.testing.assert_allclose(np.asarray(both[0]), np.asarray(solo[0]),
                               rtol=2e-5, atol=2e-5)


def test_capacity_one_expert_collapse():
    """Force all tokens to one expert: with tight capacity most are dropped
    (output zero for dropped tokens — residual carries them)."""
    p = init_switch_mlp(jax.random.PRNGKey(0), 8, 16, 4)
    p["router"] = jnp.zeros_like(p["router"]).at[:, 2].set(10.0)
    # positive-sum tokens so the linear router sends ALL tokens to expert 2
    x = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (1, 32, 8))) + 0.1
    y, aux = apply_switch_mlp(p, x, capacity_factor=0.25, router_mode="top1")
    # capacity = 0.25*32/4 = 2 tokens survive
    nonzero_rows = (np.abs(np.asarray(y[0])) .sum(-1) > 1e-6).sum()
    assert nonzero_rows <= 2
    assert float(aux) > 1.5  # heavily imbalanced


def test_sinkhorn_balances():
    logits = jax.random.normal(jax.random.PRNGKey(0), (64, 4)) * 3
    bal = sinkhorn(logits)
    np.testing.assert_allclose(np.asarray(bal.sum(0)), 0.25, rtol=0.15)


def test_moe_transformer_runs_and_trains():
    blocks = init_transformer(jax.random.PRNGKey(0), MOE_CFG)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 64))
    out, aux = apply_transformer(blocks, x, MOE_CFG)
    assert out.shape == x.shape and np.isfinite(float(aux))

    def loss(b):
        y, a = apply_transformer(b, x, MOE_CFG)
        return jnp.sum(y ** 2) + 0.01 * a

    g = jax.grad(loss)(blocks)
    # router must receive gradient (through the gate)
    assert float(jnp.abs(g["moe"]["router"]).sum()) > 0


def test_moe_sharded_matches_single(devices8):
    """EP-sharded (expert axis over fsdp) == unsharded numerics."""
    from megatron_clip_tpu.parallel import build_mesh
    from megatron_clip_tpu.parallel.sharding import clip_param_specs, make_sharding_tree
    from megatron_clip_tpu.parallel.sharding import transformer_block_specs
    import jax.tree_util as jtu

    blocks = init_transformer(jax.random.PRNGKey(0), MOE_CFG)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 16, 64))
    want = apply_transformer(blocks, x, MOE_CFG)[0]

    mesh = build_mesh(ParallelCfg(dp=2, fsdp=2, tp=2))
    from megatron_clip_tpu.parallel.sharding import _path_str
    specs = jtu.tree_map_with_path(
        lambda path, leaf: transformer_block_specs(_path_str(path), leaf.ndim,
                                                   stacked=True), blocks)
    sblocks = jax.device_put(blocks, make_sharding_tree(mesh, specs))
    got = jax.jit(lambda b, x: apply_transformer(b, x, MOE_CFG)[0])(sblocks, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)
