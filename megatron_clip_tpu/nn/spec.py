"""Module specs: declarative block customization.

The reference's mcore spec system (megatron/core/transformer/spec_utils.py:
ModuleSpec/build_module + gpt_layer_specs.py choosing TE vs local
implementations) lets users swap attention/MLP/norm implementations per
layer. The functional equivalent here: a BlockSpec names the *functions*
used inside a transformer block; `build_block_fns` resolves names through a
registry (entry points can register custom ops) and returns the init/apply
pair consumed by the stack.
"""
from dataclasses import dataclass, field
from typing import Any, Callable, Dict

_REGISTRY: Dict[str, Callable] = {}


def register_module(name: str, fn: Callable = None):
    """Register a custom implementation (decorator or direct call)."""
    def deco(f):
        _REGISTRY[name] = f
        return f
    if fn is not None:
        _REGISTRY[name] = fn
        return fn
    return deco


def resolve(ref: Any) -> Callable:
    """A spec entry is either a callable or a registered name."""
    if callable(ref):
        return ref
    if isinstance(ref, str):
        if ref not in _REGISTRY:
            raise KeyError(f"module {ref!r} not registered; "
                           f"known: {sorted(_REGISTRY)}")
        return _REGISTRY[ref]
    raise TypeError(f"spec entries must be callables or names, got {ref!r}")


@dataclass(frozen=True)
class BlockSpec:
    """Names/callables for the pieces of a transformer block
    (mcore TransformerLayerSubmodules analogue)."""

    attention: Any = "self_attention"
    mlp: Any = "mlp"
    norm: Any = "layer_norm"
    params: Dict[str, Any] = field(default_factory=dict)


def _default_registry():
    from megatron_clip_tpu.ops import multi_head_attention, layer_norm, rms_norm
    from megatron_clip_tpu.ops.moe import apply_switch_mlp
    _REGISTRY.setdefault("self_attention", multi_head_attention)
    _REGISTRY.setdefault("layer_norm", layer_norm)
    _REGISTRY.setdefault("rms_norm", rms_norm)
    _REGISTRY.setdefault("switch_mlp", apply_switch_mlp)


def build_block_fns(spec: BlockSpec) -> Dict[str, Callable]:
    """Resolve a BlockSpec into concrete callables (mcore build_module)."""
    _default_registry()
    return {
        "attention": resolve(spec.attention),
        "mlp": resolve(spec.mlp) if spec.mlp != "mlp" else None,
        "norm": resolve(spec.norm),
        "params": dict(spec.params),
    }
