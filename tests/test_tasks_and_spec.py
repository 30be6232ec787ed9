"""tasks/main.py harness + ModuleSpec registry + SigLIP CLI tests."""
import numpy as np
import pytest

from megatron_clip_tpu.tokenizer import find_bpe_vocab


def _folder(tmp_path, classes=("a", "b"), n=3, size=32):
    from PIL import Image
    rng = np.random.RandomState(0)
    for c in classes:
        d = tmp_path / "data" / c
        d.mkdir(parents=True, exist_ok=True)
        for i in range(n):
            Image.fromarray(rng.randint(0, 255, (size, size, 3), np.uint8)
                            ).save(d / f"{i}.png")
    return str(tmp_path / "data")


@pytest.mark.skipif(find_bpe_vocab() is None, reason="no BPE vocab")
def test_task_zeroshot_and_probe(tmp_path):
    import sys
    sys.path.insert(0, "tasks")
    from tasks.main import parse_args, run
    data = _folder(tmp_path)
    m = run(parse_args(["--task", "zeroshot-imagenet", "--model", "test-tiny",
                        "--data-dir", data, "--batch-size", "4"]))
    assert 0.0 <= m["imagenet-zeroshot-val-top1"] <= 1.0
    m = run(parse_args(["--task", "linear-probe", "--model", "test-tiny",
                        "--data-dir", data, "--batch-size", "4",
                        "--probe-epochs", "2"]))
    assert 0.0 <= m["linear_probe_acc"] <= 1.0


@pytest.mark.skipif(find_bpe_vocab() is None, reason="no BPE vocab")
def test_task_retrieval(tmp_path):
    from PIL import Image
    from tasks.main import parse_args, run
    rng = np.random.RandomState(0)
    rows = ["filepath\ttitle"]
    for i in range(8):
        p = tmp_path / f"i{i}.png"
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), np.uint8)).save(p)
        rows.append(f"{p}\tcaption {i}")
    csv = tmp_path / "d.tsv"
    csv.write_text("\n".join(rows))
    m = run(parse_args(["--task", "retrieval", "--model", "test-tiny",
                        "--csv", str(csv), "--batch-size", "4"]))
    assert "image_to_text_R@1" in m


def test_module_spec_registry():
    from megatron_clip_tpu.nn.spec import (
        BlockSpec, build_block_fns, register_module, resolve)
    fns = build_block_fns(BlockSpec())
    from megatron_clip_tpu.ops import multi_head_attention, layer_norm
    assert fns["attention"] is multi_head_attention
    assert fns["norm"] is layer_norm

    @register_module("my_custom_attn")
    def custom(*a, **k):
        return "custom"

    fns = build_block_fns(BlockSpec(attention="my_custom_attn"))
    assert fns["attention"]() == "custom"
    with pytest.raises(KeyError):
        resolve("nonexistent_module")


def test_siglip_cli_training():
    """--siglip routes through create_loss to SigLipLoss end-to-end."""
    from megatron_clip_tpu.training.params import parse_args
    from megatron_clip_tpu.training.loop import run_training
    m = run_training(parse_args([
        "--dataset-type", "synthetic", "--model", "test-tiny",
        "--batch-size", "8", "--epochs", "1", "--train-num-samples", "16",
        "--warmup", "1", "--log-interval", "1", "--precision", "fp32",
        "--siglip"]))
    assert np.isfinite(m["loss"])
