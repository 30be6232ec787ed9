"""Minimal shared training harness for the secondary workload entry points
(pretrain_bert/t5/vision_classify/vision_dino) — jitted AdamW steps with
loss logging; the full-featured loop (checkpointing, data, meshes) is
training/loop.py."""
import time
from typing import Callable

import jax
import optax

from megatron_clip_tpu.training.optim import make_optimizer, cosine_lr


def simple_train(params, loss_fn: Callable, batch_iter, steps: int, *,
                 lr: float = 1e-4, warmup: int = 10, weight_decay: float = 0.01,
                 grad_clip_norm: float = 1.0, log_interval: int = 5,
                 post_step: Callable = None, name: str = "train"):
    """loss_fn(params, batch) -> scalar. Returns {'loss': final}."""
    tx = make_optimizer(params, cosine_lr(lr, warmup, steps),
                        weight_decay=weight_decay,
                        grad_clip_norm=grad_clip_norm)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    t0 = time.perf_counter()
    loss = None
    for i in range(1, steps + 1):
        batch = next(batch_iter)
        params, opt_state, loss = step(params, opt_state, batch)
        if post_step is not None:
            params = post_step(params)
        if i % log_interval == 0 or i == steps:
            l = float(loss)
            dt = time.perf_counter() - t0
            print(f"[{name}] step {i}/{steps} | loss {l:.4f} | "
                  f"{log_interval / dt:.2f} it/s", flush=True)
            t0 = time.perf_counter()
    return {"loss": float(loss), "params": params}
