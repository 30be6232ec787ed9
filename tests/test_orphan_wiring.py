"""Flag/knob wiring tests (round-2 review items): remote-sync runs from the
training loop, --no-local-loss/--no-gather-with-grad are accepted, the
attentional pooler gets distinct init for wq/wo, wandb absence is a no-op."""
import os

import jax
import numpy as np

from megatron_clip_tpu.training.params import parse_args


def test_negatable_loss_flags():
    ns = parse_args(["--no-local-loss", "--no-gather-with-grad"])
    assert ns.local_loss is False and ns.gather_with_grad is False
    ns = parse_args([])
    assert ns.local_loss is True and ns.gather_with_grad is True


def test_attentional_pooler_distinct_init():
    from megatron_clip_tpu.models.vit import init_attentional_pooler
    p = init_attentional_pooler(jax.random.PRNGKey(0), 64, 64, 8)
    assert not np.allclose(np.asarray(p["attn"]["wq"]),
                           np.asarray(p["attn"]["wo"]))


def test_remote_sync_and_wandb_flags_run_training(tmp_path):
    """--remote-sync mirrors the checkpoint dir; --report-to wandb without
    the package logs a warning and trains fine."""
    from megatron_clip_tpu.training.loop import run_training
    args = parse_args([
        "--model", "test-tiny", "--dataset-type", "synthetic",
        "--train-num-samples", "32", "--batch-size", "8", "--epochs", "1",
        "--precision", "fp32", "--save", str(tmp_path / "ckpt"),
        "--save-interval", "2", "--log-interval", "2",
        "--report-to", "wandb",
        "--remote-sync", str(tmp_path / "mirror"),
        "--remote-sync-frequency", "1"])
    m = run_training(args)
    assert np.isfinite(m["loss"])
    # final blocking sync mirrored the checkpoint tree
    mirror = tmp_path / "mirror"
    assert mirror.is_dir()
    synced = [str(p) for p in mirror.rglob("*") if p.is_file()]
    assert synced, "remote-sync copied nothing"
