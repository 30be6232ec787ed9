"""End-to-end training tests, mirroring the reference's functional-test
strategy (SURVEY.md §4): 1-epoch synthetic smoke (open_CLIP
test_training_simple.py), resume-equivalence
(test_resume_checkpoint_pipeline.py), tiny-tar webdataset loader
(test_wds.py), CSV dataset."""
import io
import json
import os
import tarfile

import numpy as np
import pytest

from megatron_clip_tpu.training.params import parse_args
from megatron_clip_tpu.training.loop import run_training

TINY_ARGS = [
    "--dataset-type", "synthetic", "--batch-size", "16", "--epochs", "1",
    "--warmup", "2", "--log-interval", "2", "--precision", "fp32",
    "--model", "test-tiny", "--train-num-samples", "64",
]


def test_synthetic_one_epoch():
    m = run_training(parse_args(TINY_ARGS))
    assert np.isfinite(m["loss"]) and m["step"] == 4


def test_save_most_recent_and_delete_previous(tmp_path):
    """--save-most-recent saves at every epoch even when --save-frequency
    wouldn't; --delete-previous-checkpoint leaves only the newest iter dir
    (open_CLIP main.py:481-486 / --delete-previous-checkpoint)."""
    save = str(tmp_path / "ckroot")
    run_training(parse_args(TINY_ARGS[:-2] + [
        "--train-num-samples", "32", "--epochs", "2", "--save", save,
        "--save-frequency", "5", "--save-most-recent",
        "--delete-previous-checkpoint"]))
    root = os.path.join(save, "default")
    iters = sorted(d for d in os.listdir(root) if d.startswith("iter_"))
    assert iters == ["iter_0000004"], iters  # 2 epochs x 2 steps, only newest


def test_patch_dropout_active_in_train_step():
    """A patch_dropout model's train loss differs from the same model with
    patch_dropout disabled (the rng actually reaches apply_vit) and is
    deterministic per (seed, step)."""
    import jax
    import jax.numpy as jnp
    from megatron_clip_tpu import factory
    from megatron_clip_tpu.training import make_train_step, make_optimizer, cosine_lr
    from megatron_clip_tpu.training.train_step import TrainState

    def build(pd):
        model, params = factory.create_model(
            "test-tiny", precision="fp32", seed=0,
            vision_cfg={"image_size": 32, "layers": 2, "width": 64,
                        "head_width": 32, "patch_size": 8,
                        "patch_dropout": pd})
        tx = make_optimizer(params, cosine_lr(1e-3, 2, 10))
        return model, TrainState.create(params, tx), tx

    k = jax.random.PRNGKey(0)
    images = jax.random.normal(k, (8, 32, 32, 3), jnp.float32)
    texts = jax.random.randint(k, (8, 32), 1, 400).astype(jnp.int32)

    model0, st0, tx0 = build(0.0)
    step0 = make_train_step(model0, tx0, seed=3)
    _, m0 = step0(st0, images, texts)

    model1, st1, tx1 = build(0.5)
    step1 = make_train_step(model1, tx1, seed=3)
    _, m1 = step1(st1, images, texts)
    assert abs(float(m0["loss"]) - float(m1["loss"])) > 1e-6

    # deterministic: same seed -> same dropped patches -> same loss
    _, st2, _ = build(0.5)
    _, m2 = make_train_step(model1, tx1, seed=3)(st2, images, texts)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               atol=1e-6)


def test_wds_upsampling_factors():
    """--train-data-upsampling-factors: per-source weights bias the
    resampled shard draw (open_CLIP ResampledShards2 weights)."""
    from megatron_clip_tpu.data.webdataset import expand_urls_with_weights
    shards, w = expand_urls_with_weights(
        "a-{0..2}.tar::b-{0..1}.tar", "1::3")
    assert shards == ["a-0.tar", "a-1.tar", "a-2.tar", "b-0.tar", "b-1.tar"]
    assert w == [1.0, 1.0, 1.0, 3.0, 3.0]
    with pytest.raises(ValueError):
        expand_urls_with_weights("a.tar::b.tar", "1")
    # without --dataset-resampled the loader refuses (open_CLIP assert)
    from megatron_clip_tpu.data.webdataset import WdsData
    with pytest.raises(ValueError):
        WdsData("x.tar", 4, None, None, num_samples=4,
                upsampling_factors="2")


def test_coca_through_training_app():
    """CoCa trains through pretrain_clip's loop: factory dispatches
    init/apply to the multimodal model, create_loss to CoCaLoss with the
    --coca-*-loss-weight flags (open_CLIP main.py trains CoCa through the
    same path)."""
    m = run_training(parse_args(TINY_ARGS[:-2] + [
        "--model", "coca_test-tiny", "--train-num-samples", "32",
        "--coca-caption-loss-weight", "1.5",
        "--coca-contrastive-loss-weight", "0.5"]))
    assert np.isfinite(m["loss"])


def test_synthetic_branch_parallel(devices8):
    m = run_training(parse_args(TINY_ARGS + [
        "--extra-world-size", "4", "--tensor-model-parallel-size", "2"]))
    assert np.isfinite(m["loss"])


def test_resume_explicit_path(tmp_path):
    """--resume <dir> loads from that checkpoint root (open_CLIP main.py
    resume-by-path), without requiring --save."""
    base = [a for a in TINY_ARGS if a not in ("--train-num-samples", "64")]
    base += ["--train-num-samples", str(16 * 4), "--seed", "3"]
    m_full = run_training(parse_args(base + ["--log-interval", "1"]))

    root = str(tmp_path / "ck")
    run_training(parse_args(
        base + ["--save", root, "--name", "t", "--exit-interval", "2",
                "--save-interval", "2"]))
    m_resumed = run_training(parse_args(
        base + ["--resume", os.path.join(root, "t"), "--log-interval", "1"]))
    assert m_resumed["step"] == 4
    np.testing.assert_allclose(m_resumed["loss"], m_full["loss"],
                               rtol=1e-4, atol=1e-5)
    # a bogus path is a loud error, not a silent from-scratch run
    with pytest.raises(FileNotFoundError):
        run_training(parse_args(base + ["--resume", str(tmp_path / "nope")]))


def test_exit_interval_ends_run_not_epoch(tmp_path):
    """Hitting --exit-interval stops the whole run after one boundary
    save/eval — remaining epochs must not re-save the same step once per
    epoch (megatron --exit-interval exits outright, training.py:829)."""
    save = str(tmp_path / "ck")
    m = run_training(parse_args(TINY_ARGS[:-2] + [
        "--train-num-samples", "32", "--epochs", "10",
        "--exit-interval", "2", "--save", save, "--save-frequency", "1"]))
    assert m["step"] == 2
    root = os.path.join(save, "default")
    iters = sorted(d for d in os.listdir(root) if d.startswith("iter_"))
    assert iters == ["iter_0000002"], iters


def test_steps_per_epoch_bounds_epochs(tmp_path):
    """--steps-per-epoch shorter than the loader ends each epoch at the
    configured step count, so epoch-boundary saves land on exact
    multiples (keeps the resume step//steps_per_epoch math honest)."""
    save = str(tmp_path / "ck")
    m = run_training(parse_args(TINY_ARGS + [
        "--steps-per-epoch", "2", "--epochs", "2",
        "--save", save, "--save-frequency", "1"]))
    # loader has 4 batches/epoch but each epoch stops after 2 steps
    assert m["step"] == 4
    root = os.path.join(save, "default")
    iters = sorted(d for d in os.listdir(root) if d.startswith("iter_"))
    assert iters == ["iter_0000002", "iter_0000004"], iters


def test_datainfo_delegates_loader_controls():
    """The DataInfo wrapper must expose the underlying loader's
    set_epoch/skip_batches — the resume fast-forward probes hasattr() on
    the wrapper (training/loop.py), and without delegation a webdataset
    resume silently replays the epoch-0 shard order."""
    from megatron_clip_tpu.data.loaders import DataInfo, SyntheticData

    ds = SyntheticData(4, 16, 32, context_length=16)
    di = DataInfo(ds, ds.num_batches, 16)
    assert hasattr(di, "skip_batches")
    di.skip_batches(3)
    assert len(list(di)) == ds.num_batches - 3
    assert not hasattr(di, "set_epoch")  # SyntheticData has none — hasattr
    # stays an honest capability probe through the delegation

    class _Epochal(SyntheticData):
        def set_epoch(self, e):
            self.epoch = e

    ds2 = _Epochal(4, 16, 32, context_length=16)
    di2 = DataInfo(ds2, ds2.num_batches, 16)
    assert hasattr(di2, "set_epoch")
    di2.set_epoch(5)
    assert ds2.epoch == 5


def test_resume_equivalence(tmp_path, devices8):
    """N steps straight == N/2 steps + save + load + N/2 steps."""
    base = [a for a in TINY_ARGS if a not in ("--train-num-samples", "64")]
    base += ["--train-num-samples", str(16 * 4), "--seed", "3"]
    # straight run: 4 steps
    m_full = run_training(parse_args(base + ["--log-interval", "1"]))

    # interrupted run
    root = str(tmp_path / "ckpt")
    m_half = run_training(parse_args(
        base + ["--save", root, "--name", "t", "--exit-interval", "2",
                "--save-interval", "2", "--log-interval", "1"]))
    assert m_half["step"] == 2
    m_resumed = run_training(parse_args(
        base + ["--save", root, "--name", "t", "--resume", "latest",
                "--log-interval", "1"]))
    assert m_resumed["step"] == 4
    np.testing.assert_allclose(m_resumed["loss"], m_full["loss"],
                               rtol=1e-4, atol=1e-5)


def _make_shards(tmp_path, n_shards=2, per_shard=8, size=32):
    from PIL import Image
    paths = []
    rng = np.random.RandomState(0)
    for s in range(n_shards):
        p = tmp_path / f"shard-{s:05d}.tar"
        with tarfile.open(p, "w") as tf:
            for i in range(per_shard):
                key = f"{s:05d}{i:04d}"
                arr = rng.randint(0, 255, (size, size, 3), np.uint8)
                buf = io.BytesIO()
                Image.fromarray(arr).save(buf, format="JPEG")
                data = buf.getvalue()
                info = tarfile.TarInfo(f"{key}.jpg")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
                cap = f"a photo number {s}-{i}".encode()
                info = tarfile.TarInfo(f"{key}.txt")
                info.size = len(cap)
                tf.addfile(info, io.BytesIO(cap))
        paths.append(str(p))
    return str(tmp_path / ("shard-{00000..%05d}.tar" % (n_shards - 1)))


def test_webdataset_loader(tmp_path):
    from megatron_clip_tpu.data.webdataset import WdsData, brace_expand
    from megatron_clip_tpu.tokenizer import find_bpe_vocab, get_tokenizer
    from megatron_clip_tpu.data.transforms import image_transform
    assert brace_expand("x-{00..02}.tar") == ["x-00.tar", "x-01.tar", "x-02.tar"]
    assert brace_expand("{a,b}.tar") == ["a.tar", "b.tar"]
    if find_bpe_vocab() is None:
        pytest.skip("no BPE vocab")
    spec = _make_shards(tmp_path)
    ds = WdsData(spec, batch_size=4, preprocess=image_transform(32, False),
                 tokenizer=get_tokenizer(), num_samples=16, workers=1)
    batches = list(ds)
    assert len(batches) == 4
    imgs, txts = batches[0]
    assert imgs.shape == (4, 32, 32, 3) and txts.shape == (4, 77)
    assert txts.dtype == np.int32 and (txts[:, 0] == 49406).all()
    # epoch determinism: same seed+epoch -> same shard order
    ds2 = WdsData(spec, batch_size=4, preprocess=image_transform(32, False),
                  tokenizer=get_tokenizer(), num_samples=16, workers=1)
    b2 = list(ds2)
    np.testing.assert_array_equal(batches[0][1], b2[0][1])


def test_webdataset_training(tmp_path):
    from megatron_clip_tpu.tokenizer import find_bpe_vocab
    if find_bpe_vocab() is None:
        pytest.skip("no BPE vocab")
    spec = _make_shards(tmp_path)
    m = run_training(parse_args([
        "--train-data", spec, "--dataset-type", "webdataset",
        "--train-num-samples", "16", "--batch-size", "8", "--epochs", "1",
        "--warmup", "1", "--log-interval", "1", "--precision", "fp32",
        "--model", "test-tiny", "--workers", "1"]))
    assert np.isfinite(m["loss"])


def test_csv_training(tmp_path):
    from PIL import Image
    from megatron_clip_tpu.tokenizer import find_bpe_vocab
    if find_bpe_vocab() is None:
        pytest.skip("no BPE vocab")
    rows = ["filepath\ttitle"]
    rng = np.random.RandomState(0)
    for i in range(16):
        p = tmp_path / f"im{i}.png"
        Image.fromarray(rng.randint(0, 255, (48, 48, 3), np.uint8)).save(p)
        rows.append(f"{p}\tcaption number {i}")
    csv = tmp_path / "data.tsv"
    csv.write_text("\n".join(rows))
    m = run_training(parse_args([
        "--train-data", str(csv), "--batch-size", "8", "--epochs", "1",
        "--warmup", "1", "--log-interval", "1", "--precision", "fp32",
        "--model", "test-tiny"]))
    assert np.isfinite(m["loss"])


def test_val_and_zeroshot_eval(tmp_path):
    """Epoch-end validation + zero-shot ImageNet eval wiring
    (open_CLIP evaluate + zero_shot_eval cadence)."""
    from PIL import Image
    from megatron_clip_tpu.tokenizer import find_bpe_vocab
    if find_bpe_vocab() is None:
        pytest.skip("no BPE vocab")
    rng = np.random.RandomState(0)
    # csv train + val
    for split in ("train", "val"):
        rows = ["filepath\ttitle"]
        for i in range(8):
            p = tmp_path / f"{split}{i}.png"
            Image.fromarray(rng.randint(0, 255, (40, 40, 3), np.uint8)).save(p)
            rows.append(f"{p}\tcaption {split} {i}")
        (tmp_path / f"{split}.tsv").write_text("\n".join(rows))
    # tiny imagenet-val folder with 2 classes
    for c in ("cat", "dog"):
        d = tmp_path / "imagenet" / c
        d.mkdir(parents=True)
        for i in range(2):
            Image.fromarray(rng.randint(0, 255, (40, 40, 3), np.uint8)).save(
                d / f"{i}.png")
    import json
    import os
    # r3 review fix: an explicit-but-unreadable metadata path RAISES
    # instead of silently degrading — supply real metadata matching the
    # two folder classes instead
    meta = tmp_path / "imagenet_meta.json"
    meta.write_text(json.dumps({"classnames": ["cat", "dog"],
                                "templates": ["a photo of a {}."]}))
    os.environ["MCT_IMAGENET_METADATA"] = str(meta)
    try:
        m = run_training(parse_args([
            "--train-data", str(tmp_path / "train.tsv"),
            "--val-data", str(tmp_path / "val.tsv"),
            "--imagenet-val", str(tmp_path / "imagenet"),
            "--batch-size", "4", "--epochs", "1", "--warmup", "1",
            "--log-interval", "1", "--precision", "fp32",
            "--model", "test-tiny", "--val-frequency", "1",
            "--zeroshot-frequency", "1"]))
    finally:
        del os.environ["MCT_IMAGENET_METADATA"]
    assert "val_clip_val_loss" in m
    assert "imagenet-zeroshot-val-top1" in m
    assert 0.0 <= m["imagenet-zeroshot-val-top1"] <= 1.0


def test_wds_resampled(tmp_path):
    from megatron_clip_tpu.data.webdataset import WdsData
    from megatron_clip_tpu.tokenizer import find_bpe_vocab, get_tokenizer
    from megatron_clip_tpu.data.transforms import image_transform
    if find_bpe_vocab() is None:
        pytest.skip("no BPE vocab")
    spec = _make_shards(tmp_path)
    ds = WdsData(spec, batch_size=4, preprocess=image_transform(32, False),
                 tokenizer=get_tokenizer(), num_samples=16, workers=1,
                 resampled=True)
    batches = list(ds)
    assert len(batches) == 4  # with-replacement still honors num_batches


def test_remote_sync(tmp_path):
    from megatron_clip_tpu.utils.remote_sync import RemoteSync, _sync_dir
    src = tmp_path / "ckpt"
    dst = tmp_path / "mirror"
    (src / "iter_0000001").mkdir(parents=True)
    (src / "iter_0000001" / "state").write_text("payload")
    (src / "latest_checkpointed_iteration.txt").write_text("1")
    n = _sync_dir(str(src), str(dst))
    assert n == 2
    assert (dst / "iter_0000001" / "state").read_text() == "payload"
    # incremental: nothing new -> nothing copied
    assert _sync_dir(str(src), str(dst)) == 0
    # background thread + final()
    rs = RemoteSync(str(src), str(dst), frequency=999).start()
    (src / "latest_checkpointed_iteration.txt").write_text("2")
    import time; time.sleep(1.1)
    assert rs.final() >= 1
    assert (dst / "latest_checkpointed_iteration.txt").read_text() == "2"


def test_pretrained_init_and_image_only(tmp_path):
    """--pretrained initializes the trained model from a released .pt
    (open_CLIP main.py finetune workflow); --pretrained-image grafts the
    vision tower only (LiT-style init)."""
    torch = pytest.importorskip("torch")
    import jax
    from megatron_clip_tpu.checkpoints.torch_interop import \
        openclip_state_dict_from_params
    from megatron_clip_tpu.factory import create_model
    from megatron_clip_tpu.training.loop import _load_pretrained_init

    model, src = create_model("test-tiny", precision="fp32", seed=7)
    sd = openclip_state_dict_from_params(src, model.cfg)
    path = tmp_path / "epoch_3.pt"
    torch.save({"state_dict": {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in sd.items()}}, path)

    _, fresh = create_model("test-tiny", precision="fp32", seed=0)

    class A:
        model = "test-tiny"
        pretrained = str(path)
        pretrained_image = ""
    full = _load_pretrained_init(A(), model, fresh)
    np.testing.assert_allclose(
        np.asarray(full["text"]["tok_embed"]),
        np.asarray(src["text"]["tok_embed"]), rtol=1e-6)

    class B:
        model = "test-tiny"
        pretrained = ""
        pretrained_image = str(path)
    img_only = _load_pretrained_init(B(), model, fresh)
    np.testing.assert_allclose(
        np.asarray(img_only["visual"]["cls"]),
        np.asarray(src["visual"]["cls"]), rtol=1e-6)
    assert not np.allclose(np.asarray(img_only["text"]["tok_embed"]),
                           np.asarray(src["text"]["tok_embed"]))

    # the full CLI path accepts the flag end-to-end
    m = run_training(parse_args(TINY_ARGS[:-2] + [
        "--train-num-samples", "32", "--pretrained", str(path),
        "--skip-scheduler"]))
    assert np.isfinite(m["loss"])
