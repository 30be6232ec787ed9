"""Async checkpointing (checkpoints/io.AsyncSaver).

The reference hides checkpoint cost behind a background remote-sync process
(open_CLIP/src/training/main.py:176-196); here the Orbax array write itself
runs in background: save(block=False) returns after the device->host
snapshot, training proceeds during serialization, and the tracker file is
written only after the write commits (crash consistency — the tracker never
points at a torn checkpoint).
"""
import json
import os
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

from megatron_clip_tpu.checkpoints.io import (
    AsyncSaver, TRACKER_FILENAME, latest_checkpoint_step, load_checkpoint,
    save_checkpoint)


class _StallingCkptr:
    """Fake Orbax checkpointer whose commit blocks on an event — makes the
    ordering assertions deterministic instead of racing real serialization."""

    def __init__(self, gate: threading.Event):
        self.gate = gate
        self.saved = []
        self.committed = threading.Event()

    def save(self, path, state, force=False):
        self.saved.append((path, state))

    def wait_until_finished(self):
        assert self.gate.wait(timeout=30), "test gate never opened"
        self.committed.set()


def test_tracker_written_only_after_commit(tmp_path):
    saver = AsyncSaver()
    gate = threading.Event()
    fake = _StallingCkptr(gate)
    saver._ckptr = fake

    root = str(tmp_path / "ck")
    saver.save(root, 7, {"x": np.arange(3)}, {"consumed_samples": 21},
               block=False)
    # the save call returned while the array write is still in flight:
    # training would be running here — and the tracker must NOT exist yet
    assert saver.in_flight
    assert not os.path.exists(os.path.join(root, TRACKER_FILENAME))
    assert not os.path.exists(os.path.join(root, "iter_0000007",
                                           "metadata.json"))
    gate.set()
    saver.wait()
    assert fake.committed.is_set()
    with open(os.path.join(root, TRACKER_FILENAME)) as f:
        assert int(f.read()) == 7
    with open(os.path.join(root, "iter_0000007", "metadata.json")) as f:
        assert json.load(f)["consumed_samples"] == 21


def test_next_save_barriers_on_in_flight(tmp_path):
    saver = AsyncSaver()
    gate = threading.Event()
    fake = _StallingCkptr(gate)
    saver._ckptr = fake
    root = str(tmp_path / "ck")
    saver.save(root, 1, {"x": 1}, block=False)
    assert saver.in_flight

    def open_gate_soon():
        time.sleep(0.2)
        gate.set()

    t = threading.Thread(target=open_gate_soon)
    t.start()
    # a second save must wait for the first commit (one in flight at a time)
    saver.save(root, 2, {"x": 2}, block=False)
    saver.wait()
    t.join()
    assert latest_checkpoint_step(root) == 2
    assert len(fake.saved) == 2


def test_async_roundtrip_through_module_api(tmp_path):
    """Real Orbax end to end: save(block=False) -> loader barriers on the
    in-flight write and restores the exact state."""
    root = str(tmp_path / "ck")
    state = {"params": {"w": jnp.arange(12.0).reshape(3, 4)},
             "step": jnp.asarray(5)}
    save_checkpoint(root, 5, state, {"consumed_samples": 40}, block=False)
    # latest_checkpoint_step/load_checkpoint barrier internally; no sleep
    assert latest_checkpoint_step(root) == 5
    restored, meta, step = load_checkpoint(root, state)
    assert step == 5 and meta["consumed_samples"] == 40
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.asarray(state["params"]["w"]))


def test_mutation_after_async_save_does_not_corrupt(tmp_path):
    """The device->host snapshot happens inside save(): donating/overwriting
    the live arrays afterwards (exactly what the train loop does on the next
    step) must not change what lands on disk."""
    root = str(tmp_path / "ck")
    x = jnp.ones((256, 256), jnp.float32)
    state = {"w": x}
    save_checkpoint(root, 1, state, block=False)
    # stomp the buffer the way a donated train step would
    state["w"] = state["w"] * 0 - 7.0
    restored, _, _ = load_checkpoint(root, {"w": x})
    np.testing.assert_array_equal(np.asarray(restored["w"]),
                                  np.ones((256, 256), np.float32))


def test_prune_runs_only_after_commit(tmp_path):
    """--delete-previous-checkpoint composes with async saves: the previous
    checkpoint (the only durable copy while the new write is in flight)
    survives until the tracker points at the committed write — pruning
    rides the on_commit hook, never the call site."""
    saver = AsyncSaver()
    gate = threading.Event()
    fake = _StallingCkptr(gate)
    saver._ckptr = fake
    root = str(tmp_path / "ck")
    prev = os.path.join(root, "iter_0000001")
    os.makedirs(prev)

    def prune():
        import shutil
        for d in os.listdir(root):
            if d.startswith("iter_") and d != "iter_0000002":
                shutil.rmtree(os.path.join(root, d))

    saver.save(root, 2, {"x": 1}, block=False, on_commit=prune)
    assert saver.in_flight
    assert os.path.isdir(prev)     # still there mid-serialization
    gate.set()
    saver.wait()
    assert not os.path.isdir(prev)  # pruned only after the tracker landed
    with open(os.path.join(root, TRACKER_FILENAME)) as f:
        assert int(f.read()) == 2
