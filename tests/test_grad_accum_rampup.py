"""Gradient accumulation at pp=1 + sample-exact rampup draws.

Covers the round-4 runtime additions:
- `--micro-batch-size` at pp=1 runs the reference's no-pipelining
  microbatch loop (megatron core/pipeline_parallel/schedules.py:286) as a
  lax.scan inside the jitted step, with fp32 grad accumulators — parity
  with the full-batch step is exact up to fp32 reassociation.
- `--rampup-batch-size` draws EXACTLY gbs samples per step, carrying the
  unused tail of each source batch forward (megatron microbatches.py:83-144
  + data_samplers.py consumed-samples law), including across resume.
"""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from megatron_clip_tpu.training.workload import (
    RuntimeCfg, run_workload, _BatchDrawer)


def _mlp_loss(params, batch, rng=None):
    h = jnp.tanh(batch["x"] @ params["w1"])
    pred = h @ params["w2"]
    return jnp.mean((pred - batch["y"]) ** 2)


def _mlp_params(key=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    return {"w1": jax.random.normal(k1, (6, 16)) * 0.3,
            "w2": jax.random.normal(k2, (16, 3)) * 0.3}


def _data(n_steps, bs, seed=0):
    rng = np.random.RandomState(seed)
    return [{"x": rng.randn(bs, 6).astype(np.float32),
             "y": rng.randn(bs, 3).astype(np.float32)}
            for _ in range(n_steps)]


def test_grad_accum_matches_full_batch():
    """micro-batch accumulation == the full-batch step, numerically (the
    VERDICT-r3 done-criterion: exact-parity test vs the full-batch step)."""
    batches = _data(6, 8)
    rc_full = RuntimeCfg(train_steps=6, batch_size=8, lr=1e-2, warmup=0,
                         log_interval=1)
    rc_acc = RuntimeCfg(train_steps=6, batch_size=8, lr=1e-2, warmup=0,
                        log_interval=1, micro_batch_size=2)

    shapes_full, shapes_acc = [], []

    def loss_full(p, b, rng=None):
        shapes_full.append(b["x"].shape)
        return _mlp_loss(p, b)

    def loss_acc(p, b, rng=None):
        shapes_acc.append(b["x"].shape)
        return _mlp_loss(p, b)

    r_full = run_workload(_mlp_params(), loss_full, iter(batches), rc_full)
    r_acc = run_workload(_mlp_params(), loss_acc, iter(batches), rc_acc)

    # the accumulating step really traced per-microbatch activations
    assert set(shapes_full) == {(8, 6)}
    assert set(shapes_acc) == {(2, 6)}
    for a, b in zip(jax.tree.leaves(r_full["params"]),
                    jax.tree.leaves(r_acc["params"])):
        np.testing.assert_allclose(a, b, atol=2e-6, rtol=2e-6)
    # loss history matches step for step
    for (i1, l1), (i2, l2) in zip(r_full["history"], r_acc["history"]):
        assert i1 == i2
        assert abs(l1 - l2) < 1e-5, (i1, l1, l2)


def test_grad_accum_micro_equal_batch_is_identity():
    """micro == global batch degenerates to the plain step (no scan)."""
    batches = _data(3, 4)
    rc = RuntimeCfg(train_steps=3, batch_size=4, lr=1e-2, warmup=0,
                    log_interval=1, micro_batch_size=4)
    shapes = []

    def loss(p, b, rng=None):
        shapes.append(b["x"].shape)
        return _mlp_loss(p, b)

    run_workload(_mlp_params(), loss, iter(batches), rc)
    assert set(shapes) == {(4, 6)}


def test_grad_accum_rejects_indivisible():
    rc = RuntimeCfg(train_steps=2, batch_size=8, lr=1e-2, warmup=0,
                    micro_batch_size=3)
    with pytest.raises(SystemExit, match="divisible"):
        run_workload(_mlp_params(), _mlp_loss, iter(_data(2, 8)), rc)


def test_grad_accum_with_rng_and_aux():
    """The accumulation path composes with use_rng and the aux_update hook
    (DINO-style EMA state): aux still updates once per step with the
    microbatch-averaged loss_aux."""
    batches = _data(4, 8)
    rc = RuntimeCfg(train_steps=4, batch_size=8, lr=1e-2, warmup=0,
                    log_interval=1, micro_batch_size=4)

    def loss(p, b, rng, aux):
        noise = jax.random.normal(rng, b["y"].shape) * 1e-3
        l = jnp.mean((jnp.tanh(b["x"] @ p["w1"]) @ p["w2"]
                      + noise - b["y"]) ** 2)
        return l, {"batch_mean": jnp.mean(b["x"])}

    def aux_update(aux, params, loss_aux):
        return {"ema": 0.9 * aux["ema"] + 0.1 * loss_aux["batch_mean"],
                "n": aux["n"] + 1}

    res = run_workload(_mlp_params(), loss, iter(batches), rc,
                       use_rng=True, aux_state={"ema": jnp.zeros(()),
                                                "n": jnp.zeros((), jnp.int32)},
                       aux_update=aux_update)
    assert int(res["aux"]["n"]) == 4  # one aux update per STEP, not per mb
    assert np.isfinite(float(res["aux"]["ema"]))


# ---------------------------------------------------------------------------
# rampup: sample-exact draws


def _id_batches(bs, start_row=0):
    """Source batches whose rows are globally-numbered sample ids."""
    row = start_row
    while True:
        ids = np.arange(row, row + bs, dtype=np.float32)
        row += bs
        yield {"x": ids[:, None], "step_tag": np.float32(row)}


def _rampup_sizes(total_steps, gbs, start, inc, ramp_samples):
    """megatron microbatches.py law: +inc every ramp_samples/n_incr
    consumed samples."""
    from megatron_clip_tpu.training.microbatches import (
        build_num_microbatches_calculator)
    calc = build_num_microbatches_calculator(gbs, 1, 1, (start, inc,
                                                         ramp_samples))
    sizes, consumed = [], 0
    for _ in range(total_steps):
        calc.update(consumed)
        s = calc.current_global_batch_size()
        sizes.append(s)
        consumed += s
    return sizes


def test_rampup_draws_exactly_gbs_samples(tmp_path):
    """Each ramped step consumes exactly gbs consecutive sample ids — no
    dropped tail rows (megatron's consumed-samples ->dataset-position law).
    Verified through the loss: with lr=0 the loss of step i is the mean of
    the ids it drew."""
    rc = RuntimeCfg(train_steps=8, batch_size=8, lr=0.0, warmup=0,
                    log_interval=1, rampup_batch_size=(2, 2, 10),
                    save=str(tmp_path / "ck"), save_interval=8)

    def loss(p, b, rng=None):
        return jnp.mean(p["w"] * b["x"])

    res = run_workload({"w": jnp.ones(())}, loss, _id_batches(8), rc)

    sizes = _rampup_sizes(8, 8, 2, 2, 10)
    assert sizes == [2, 2, 4, 6, 8, 8, 8, 8]
    expected, row = [], 0
    for s in sizes:
        expected.append(np.arange(row, row + s, dtype=np.float64).mean())
        row += s
    got = [l for (_, l) in res["history"]]
    np.testing.assert_allclose(got, expected, rtol=1e-6)
    meta = json.loads(sorted((tmp_path / "ck").glob(
        "iter_*/metadata.json"))[-1].read_text())
    assert meta["consumed_samples"] == sum(sizes) == row


def test_rampup_resume_continues_exact_stream(tmp_path):
    """Stop a ramped run mid-ramp and resume with a seekable factory: the
    resumed steps draw the SAME sample ids the uninterrupted run would
    (mid-source-batch positions included)."""
    def loss(p, b, rng=None):
        return jnp.mean(p["w"] * b["x"])

    full = run_workload(
        {"w": jnp.ones(())}, loss, _id_batches(8),
        RuntimeCfg(train_steps=8, batch_size=8, lr=0.0, warmup=0,
                   log_interval=1, rampup_batch_size=(2, 2, 10)))

    ck = str(tmp_path / "ck2")
    run_workload(
        {"w": jnp.ones(())}, loss, _id_batches(8),
        RuntimeCfg(train_steps=3, batch_size=8, lr=0.0, warmup=0,
                   log_interval=1, rampup_batch_size=(2, 2, 10),
                   save=ck, save_interval=3))

    # seekable factory: fn(start_batches) resumes the id stream at a
    # source-batch boundary; the runtime skips the already-consumed rows
    factory = lambda start_batches: _id_batches(   # noqa: E731
        8, start_row=start_batches * 8)
    resumed = run_workload(
        {"w": jnp.ones(())}, loss, factory,
        RuntimeCfg(train_steps=8, batch_size=8, lr=0.0, warmup=0,
                   log_interval=1, rampup_batch_size=(2, 2, 10),
                   save=ck, resume=True))

    full_hist = dict(full["history"])
    for step, l in resumed["history"]:
        assert abs(l - full_hist[step]) < 1e-9, (step, l, full_hist[step])


def test_batch_drawer_carries_tail_and_passthrough():
    d = _BatchDrawer(_id_batches(4), 4)
    a = d.draw(3)
    np.testing.assert_array_equal(a["x"][:, 0], [0, 1, 2])
    b = d.draw(3)   # 1 leftover row + 2 from the next source batch
    np.testing.assert_array_equal(b["x"][:, 0], [3, 4, 5])
    c = d.draw(6)
    np.testing.assert_array_equal(c["x"][:, 0], [6, 7, 8, 9, 10, 11])
    # non-batch leaves pass through with the latest value
    assert b["step_tag"] == np.float32(8)


def test_rampup_composes_with_grad_accum():
    """Ramped sizes stay divisible by the microbatch (lcm granularity) and
    the scan length follows the ramped size."""
    shapes = []

    def loss(p, b, rng=None):
        shapes.append(b["x"].shape)
        return jnp.mean(p["w"] * b["x"])

    rc = RuntimeCfg(train_steps=6, batch_size=8, lr=0.0, warmup=0,
                    log_interval=1, rampup_batch_size=(2, 2, 10),
                    micro_batch_size=2)
    run_workload({"w": jnp.ones(())}, loss, _id_batches(8), rc)
    # every traced microbatch is exactly micro_batch_size rows
    assert set(shapes) == {(2, 1)}, shapes


# ---------------------------------------------------------------------------
# CsvData epoch resync (advisor r3 finding: resume into epoch N replayed the
# epoch-0 shuffle, so skip_batches fast-forwarded the wrong samples)


def test_csvdata_set_epoch_resyncs_shuffle(tmp_path):
    from PIL import Image
    from megatron_clip_tpu.data.loaders import CsvData

    rows = ["filepath\ttitle"]
    for i in range(8):
        p = tmp_path / f"im{i}.png"
        Image.new("RGB", (4, 4), (i * 20, 0, 0)).save(p)
        rows.append(f"{p}\tcap{i}")
    csv_path = tmp_path / "data.tsv"
    csv_path.write_text("\n".join(rows) + "\n")

    def make(epoch=None):
        ds = CsvData(str(csv_path), 2, lambda im: np.zeros((2, 2, 3)),
                     lambda caps, L: [[int(c[3:])] * L for c in caps],
                     shuffle=True, seed=7)
        if epoch is not None:
            ds.set_epoch(epoch)
        return ds

    def epoch_order(ds):
        return [int(t[0]) for _, toks in ds for t in toks]

    fresh = make()
    e0 = epoch_order(fresh)      # advances fresh.epoch to 1
    e1 = epoch_order(fresh)
    assert e0 != e1              # per-epoch shuffle differs
    resumed = make(epoch=1)      # mid-run resume into epoch 1
    assert epoch_order(resumed) == e1
