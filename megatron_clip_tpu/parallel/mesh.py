"""Device-mesh construction.

This file replaces the reference's process-group state machine
(megatron/core/parallel_state.py:99-561 — 1069 LoC of NCCL `new_group`
bookkeeping with rank offsets). On TPU the equivalent state is one
`jax.sharding.Mesh` whose named axes play the role of process groups:

    reference group                      mesh axis
    ---------------                      ---------
    data-parallel group                  "data" (+ "fsdp" for ZeRO sharding)
    tensor-model-parallel group          "tensor"
    pipeline-model-parallel group        "stage"
    expert-parallel group                "expert" (folded over data axes)

`get_*_group()/rank()/world_size()` getters become `mesh.shape[axis]` /
`jax.lax.axis_index(axis)`; collectives are `psum/all_gather/ppermute` over
axis names. The branch split (`extra_world_size`) is in parallel/branch.py.
"""
from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA = "data"
FSDP = "fsdp"
TENSOR = "tensor"
STAGE = "stage"
CONTEXT = "context"
EXPERT = "expert"

MeshAxes = (DATA, FSDP, TENSOR, STAGE, CONTEXT)


def build_mesh(cfg, devices: Optional[Sequence] = None) -> Mesh:
    """Build a Mesh of shape (dp, fsdp, tp, pp) from a ParallelCfg.

    Axis order puts `tensor` innermost-but-one so TP collectives ride the
    fastest ICI hops, with `stage` outermost-minor so pipeline p2p is
    neighbour-to-neighbour (the layout megatron's rank-ordering achieves with
    `tp-pp-dp` rank assignment, parallel_state.py docstring).
    """
    cfg.validate()
    devices = list(devices if devices is not None else jax.devices())
    need = cfg.num_devices
    if len(devices) < need:
        raise ValueError(f"need {need} devices for {cfg}, have {len(devices)}")
    devices = devices[:need]
    cp = getattr(cfg, "cp", 1)
    dcn = getattr(cfg, "dcn_dp", 1)
    if dcn > 1:
        # Multi-slice: data parallelism across slices rides DCN; everything
        # else stays within a slice on ICI. When the runtime exposes slice
        # topology (real multi-slice TPU), create_hybrid_device_mesh groups
        # devices slice-major; otherwise (single slice / virtual CPU devices)
        # a contiguous split is the same layout by construction.
        shape_ici = (cfg.dp, cfg.fsdp, cfg.pp, cp, cfg.tp)
        try:
            from jax.experimental import mesh_utils
            arr = mesh_utils.create_hybrid_device_mesh(
                shape_ici, (dcn, 1, 1, 1, 1), devices=devices)
        except Exception as e:  # noqa: BLE001
            # Benign only when devices expose no slice topology (virtual
            # CPU devices / one physical slice): a contiguous split is the
            # same layout by construction. On real multi-slice hardware a
            # hybrid-mesh failure must be loud — the contiguous fallback
            # would interleave slices across tensor/stage dims and put TP
            # collectives on the DCN.
            slices = {getattr(d, "slice_index", None) for d in devices}
            if len(slices) > 1:
                raise ValueError(
                    f"dcn_dp={dcn} hybrid mesh failed on multi-slice "
                    f"devices (slices={sorted(slices)}): {e}") from e
            if slices != {None}:
                import warnings
                warnings.warn(
                    f"dcn_dp={dcn} requested but all devices are on one "
                    "slice; using a contiguous split (no DCN boundary "
                    "exists to respect)")
            arr = np.asarray(devices).reshape(dcn * cfg.dp, cfg.fsdp,
                                              cfg.pp, cp, cfg.tp)
    else:
        arr = np.asarray(devices).reshape(cfg.dp, cfg.fsdp, cfg.pp, cp, cfg.tp)
    # mesh dims ordered (data, fsdp, stage, context, tensor): tensor
    # fastest-varying so TP collectives ride the fastest ICI hops; context
    # adjacent so the ring-attention ppermute is neighbour-to-neighbour
    return Mesh(arr, (DATA, FSDP, STAGE, CONTEXT, TENSOR))


def manual_axes() -> set:
    """Mesh axes already manualized by an enclosing shard_map at the current
    trace point (empty outside any manual region). Lets ops that open their
    own shard_map (ring attention) or place sharding constraints
    (_sp_constraint) compose when called inside another manual region —
    e.g. context parallelism inside the pipeline's stage region."""
    am = jax.sharding.get_abstract_mesh()
    if am is None or not am.axis_names:
        return set()
    try:
        return {n for n, t in zip(am.axis_names, am.axis_types)
                if "Manual" in str(t)}
    except Exception:  # noqa: BLE001 — older mesh objects without axis_types
        return set()


def batch_spec(mesh: Mesh, extra_dims: int = 0) -> P:
    """PartitionSpec for a [B, ...] batch: shard batch over data+fsdp."""
    return P((DATA, FSDP), *([None] * extra_dims))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def named(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


@dataclass(frozen=True)
class MeshInfo:
    """Convenience getters mirroring parallel_state's rank/world-size API."""

    mesh: Mesh

    def world_size(self, axis: str) -> int:
        return self.mesh.shape.get(axis, 1)

    @property
    def data_parallel_world_size(self):
        return self.world_size(DATA) * self.world_size(FSDP)

    @property
    def tensor_model_parallel_world_size(self):
        return self.world_size(TENSOR)

    @property
    def pipeline_model_parallel_world_size(self):
        return self.world_size(STAGE)
