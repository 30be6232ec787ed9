"""Checkpoint save/load.

Replaces both of the reference's checkpoint generations (SURVEY.md §5):
  - legacy megatron per-(tp,pp)-rank `mp_rank_XX/model_optim_rng.pt` files +
    `latest_checkpointed_iteration.txt` tracker (megatron/checkpointing.py:
    80-117,215-314) — on TPU there are no rank files: Orbax writes the
    global sharded arrays directly;
  - mcore dist_checkpointing ShardedTensor/zarr (megatron/core/
    dist_checkpointing/) — subsumed by Orbax's OCDBT/zarr storage.

Kept semantics: the tracker file name, iteration-numbered directories
(`iter_0000100/`), consumed-samples metadata driving dataloader resume
(megatron/training.py:1031-1038), and `--finetune`-style model-only loads.
"""
import atexit
import json
import os
import threading
from typing import Any, Optional, Tuple

import jax

TRACKER_FILENAME = "latest_checkpointed_iteration.txt"


def _iter_dir(root: str, step: int) -> str:
    return os.path.join(root, f"iter_{step:07d}")


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.StandardCheckpointer()


def _write_tracker(root: str, step: int) -> None:
    tmp = os.path.join(root, TRACKER_FILENAME + ".tmp")
    with open(tmp, "w") as f:
        f.write(str(step))
    os.replace(tmp, os.path.join(root, TRACKER_FILENAME))  # atomic, like
    # open_CLIP --save-most-recent tmp->replace (main.py:481-486)


class AsyncSaver:
    """Non-blocking checkpoint writes (the reference hides checkpoint cost
    behind a background remote-sync process, open_CLIP main.py:176-196;
    at ViT-H scale an inline save stalls the step loop for the full
    serialization).

    - `save(..., block=False)` returns once the device->host snapshot is
      taken (Orbax AsyncCheckpointer); serialization runs in background.
    - Crash consistency: `metadata.json` and the tracker file are written
      by the finalize thread only AFTER the array write commits, so the
      tracker never points at a torn checkpoint.
    - One save in flight at a time: a new save (or `wait()`, called on
      load/exit/SIGTERM paths) barriers on the previous one first.
    """

    def __init__(self):
        self._ckptr = None
        self._thread: Optional[threading.Thread] = None
        self._lock = threading.Lock()

    def _ensure(self):
        import orbax.checkpoint as ocp
        if self._ckptr is None:
            self._ckptr = ocp.AsyncCheckpointer(
                ocp.StandardCheckpointHandler())
        return self._ckptr

    def save(self, root: str, step: int, state: Any,
             metadata: Optional[dict] = None, block: bool = True,
             on_commit=None) -> str:
        with self._lock:
            self.wait()
            os.makedirs(root, exist_ok=True)
            path = os.path.abspath(_iter_dir(root, step))
            ckptr = self._ensure()
            ckptr.save(os.path.join(path, "state"), state, force=True)

            def finalize():
                ckptr.wait_until_finished()
                if metadata is not None:
                    os.makedirs(path, exist_ok=True)
                    with open(os.path.join(path, "metadata.json"), "w") as f:
                        json.dump(metadata, f, indent=1)
                _write_tracker(root, step)
                if on_commit is not None:
                    # post-commit work (e.g. --delete-previous-checkpoint
                    # pruning) MUST NOT run while this write is the only
                    # one in flight and the previous checkpoint is still
                    # the sole durable copy — so it runs here, after the
                    # tracker points at the committed write
                    on_commit()

            if block:
                finalize()
            else:
                self._thread = threading.Thread(
                    target=finalize, name=f"ckpt-finalize-{step}",
                    daemon=False)
                self._thread.start()
            return path

    def wait(self) -> None:
        """Barrier: block until any in-flight save has committed."""
        t, self._thread = self._thread, None
        if t is not None:
            t.join()

    @property
    def in_flight(self) -> bool:
        return self._thread is not None and self._thread.is_alive()


_SAVER = AsyncSaver()
atexit.register(_SAVER.wait)


def global_saver() -> AsyncSaver:
    return _SAVER


def save_checkpoint(root: str, step: int, state: Any,
                    metadata: Optional[dict] = None,
                    block: bool = True, on_commit=None) -> str:
    """Write `root/iter_XXXXXXX/` + tracker file. `state` is any pytree
    (TrainState, BranchState, raw params). With block=False the write
    commits in background (see AsyncSaver); the tracker appears only after
    commit, and the next save/load/exit barriers on it. `on_commit` runs
    after the tracker write (both modes) — destructive follow-ups like
    previous-checkpoint pruning belong there, never next to an async
    save call."""
    return _SAVER.save(root, step, state, metadata, block=block,
                       on_commit=on_commit)


def latest_checkpoint_step(root: str) -> Optional[int]:
    _SAVER.wait()  # an in-flight async save may be about to move the tracker
    tracker = os.path.join(root, TRACKER_FILENAME)
    if not os.path.isfile(tracker):
        return None
    with open(tracker) as f:
        return int(f.read().strip())


def load_checkpoint(root: str, abstract_state: Any,
                    step: Optional[int] = None) -> Tuple[Any, dict, int]:
    """Restore (state, metadata, step). `abstract_state` provides the pytree
    structure/shardings (pass the freshly-initialized state)."""
    _SAVER.wait()
    if step is None:
        step = latest_checkpoint_step(root)
        if step is None:
            raise FileNotFoundError(f"no {TRACKER_FILENAME} under {root}")
    path = os.path.abspath(_iter_dir(root, step))
    ckptr = _checkpointer()
    target = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=getattr(x, "sharding", None))
        if hasattr(x, "shape") else x, abstract_state)
    state = ckptr.restore(os.path.join(path, "state"), target)
    meta_path = os.path.join(path, "metadata.json")
    metadata = {}
    if os.path.isfile(meta_path):
        with open(meta_path) as f:
            metadata = json.load(f)
    return state, metadata, step


def load_checkpoint_metadata(root: str, step: Optional[int] = None) -> dict:
    """Read only metadata.json of a checkpoint (no array restore) — backs
    `--use-checkpoint-args` (megatron checkpointing.py:441
    load_args_from_checkpoint reads the args pickle without the model)."""
    if step is None:
        step = latest_checkpoint_step(root)
        if step is None:
            raise FileNotFoundError(f"no {TRACKER_FILENAME} under {root}")
    meta_path = os.path.join(_iter_dir(root, step), "metadata.json")
    if not os.path.isfile(meta_path):
        return {}
    with open(meta_path) as f:
        return json.load(f)


def load_params_subtree(root: str, key: str = "params",
                        step: Optional[int] = None) -> Tuple[Any, int]:
    """Restore one top-level subtree of a checkpoint without a template —
    megatron's `--finetune` model-only load (checkpointing.py:525: ignores
    optimizer/RNG state, resets the iteration counter). The on-disk
    structure drives the restore, so the source run's optimizer layout
    (e.g. a different --nu-dtype) doesn't have to match the new run's."""
    if step is None:
        step = latest_checkpoint_step(root)
        if step is None:
            raise FileNotFoundError(f"no {TRACKER_FILENAME} under {root}")
    path = os.path.abspath(_iter_dir(root, step))
    state = _checkpointer().restore(os.path.join(path, "state"))
    if key not in state:
        raise KeyError(f"checkpoint at {path} has no {key!r} subtree "
                       f"(keys: {list(state)})")
    return state[key], step
