"""Activation functions + fused bias-activation.

Replaces megatron's torch.jit fused bias_gelu/bias_dropout_add
(megatron/core/fusions/fused_bias_gelu.py, fused_bias_dropout.py). On TPU,
XLA fuses bias+activation into the producing matmul automatically, so these
are named ops for API parity, not hand kernels.
"""
import jax
import jax.numpy as jnp


def quick_gelu(x):
    """OpenAI CLIP's QuickGELU: x * sigmoid(1.702 x)
    (open_CLIP/src/open_clip/transformer.py QuickGELU)."""
    return x * jax.nn.sigmoid(1.702 * x)


def gelu_tanh(x):
    return jax.nn.gelu(x, approximate=True)


def gelu_exact(x):
    return jax.nn.gelu(x, approximate=False)


def squared_relu(x):
    """megatron --squared-relu (megatron/model/transformer.py ParallelMLP:
    F.relu(x) ** 2)."""
    r = jax.nn.relu(x)
    return r * r


_ACTS = {
    "gelu": gelu_exact,        # torch nn.GELU default = exact erf gelu
    "gelu_tanh": gelu_tanh,    # megatron --openai-gelu style tanh approximation
    "quick_gelu": quick_gelu,
    "relu": jax.nn.relu,
    "silu": jax.nn.silu,
    "squared_relu": squared_relu,
}


def get_act(name: str):
    return _ACTS[name]


def bias_act(x, bias, act: str):
    """bias-add + activation as one named op (XLA fuses into the GEMM)."""
    if bias is not None:
        x = x + bias
    return get_act(act)(x)


def swiglu(x_and_gate, bias=None):
    """SwiGLU used by megatron --swiglu (megatron/model/transformer.py:94-106):
    the first linear produces 2*ffn_hidden, split into value & gate."""
    if bias is not None:
        x_and_gate = x_and_gate + bias
    x, gate = jnp.split(x_and_gate, 2, axis=-1)
    return jax.nn.silu(gate) * x
