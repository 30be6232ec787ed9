"""Pallas TPU kernels — the replacements for the reference's CUDA fused ops
(SURVEY.md §2.2): flash attention, fused layernorm, scaled-masked softmax.
Every kernel has a jnp oracle in ops/ and a parity test in tests/.
"""
