"""Vision downstream tasks: classification finetune + semantic segmentation.

The TPU counterpart of the reference's tasks/vision harness:
  - classification finetune of a ViT backbone + fresh head on an
    ImageFolder, epoch loop with per-epoch dev accuracy
    (tasks/vision/classification/classification.py via
    finetune_utils.finetune);
  - SegFormer-style semantic segmentation: MiT hierarchical backbone + the
    all-MLP decode head — per-stage linear projections, upsample to 1/4
    resolution, concat, fuse, classify, upsample to full resolution —
    with pixel cross-entropy (ignore-index) and mIoU eval
    (tasks/vision/segmentation/finetune_segformer.py, seg_heads.py,
    cityscapes.py).

Both run as pure-JAX jitted steps; the backbone can start from a CLIP
checkpoint's visual tower (classification) or random init.
"""
import os

import numpy as np


# --------------------------- classification ---------------------------------

def run_vision_classify(args):
    """Finetune ViT + head on an ImageFolder (train/ & optional val/)."""
    import jax
    import jax.numpy as jnp
    import optax
    from megatron_clip_tpu.config import VisionCfg
    from megatron_clip_tpu.data.image_folder import (
        image_folder_batches, scan_image_folder)
    from megatron_clip_tpu.models.vision_classify import (
        init_vit_classifier, classification_loss, apply_vit_classifier)
    from megatron_clip_tpu.training.optim import make_optimizer, cosine_lr

    train_dir = os.path.join(args.data_dir, "train") \
        if os.path.isdir(os.path.join(args.data_dir, "train")) else args.data_dir
    val_dir = os.path.join(args.data_dir, "val")
    if not os.path.isdir(val_dir):
        val_dir = train_dir
    train_files, classes = scan_image_folder(train_dir)
    num_classes = len(classes)    # the folder defines the label space
    # val labels MUST come from the train class list: an independent val
    # scan would silently shift indices when val/ misses a class
    val_files, _ = (train_files, classes) if val_dir == train_dir else \
        scan_image_folder(val_dir, class_names=classes)

    cfg = VisionCfg(layers=args.num_layers, width=args.hidden_size,
                    patch_size=args.patch_size, image_size=args.img_size)
    params = init_vit_classifier(jax.random.PRNGKey(args.seed), cfg,
                                 num_classes)
    if args.pretrained:
        # warm-start the backbone from a CLIP checkpoint's visual tower
        # (reference classification.py --pretrained-checkpoint)
        from megatron_clip_tpu.checkpoints.torch_interop import \
            load_openclip_checkpoint
        from megatron_clip_tpu import factory
        model, cparams = factory.create_model(args.model, init_params=True)
        cparams = load_openclip_checkpoint(args.pretrained, model.cfg,
                                           cparams)
        vis = cparams["visual"]
        for k in params["backbone"]:
            if k in vis and k != "proj" and \
                    jax.tree.structure(params["backbone"][k]) == \
                    jax.tree.structure(vis[k]):
                params["backbone"][k] = vis[k]

    n_train = len(train_files)   # reuse the scan (ImageNet-size walks are slow)
    batch_size = min(args.batch_size, n_train)
    if batch_size < args.batch_size:
        print(f"[vision-classify] only {n_train} training images: "
              f"batch size clamped to {batch_size}", flush=True)
    steps_per_epoch = max(1, n_train // batch_size)
    total = steps_per_epoch * args.epochs
    tx = make_optimizer(params, cosine_lr(args.lr, min(10, total // 10),
                                          total),
                        weight_decay=0.05, grad_clip_norm=1.0)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, images, labels):
        loss, g = jax.value_and_grad(
            lambda p: classification_loss(p, images, labels, cfg,
                                          compute_dtype=jnp.float32))(params)
        u, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, u), opt, loss

    @jax.jit
    def predict(params, images):
        return jnp.argmax(apply_vit_classifier(
            params, images, cfg, compute_dtype=jnp.float32), -1)

    def evaluate():
        n_ok = n = 0
        for images, labels in image_folder_batches(
                val_dir, min(args.batch_size, len(val_files)),
                args.img_size, is_train=False, epochs=1, seed=args.seed,
                samples=val_files):
            pred = np.asarray(predict(params, jnp.asarray(images)))
            n_ok += int((pred == np.asarray(labels)).sum())
            n += len(labels)
        return n_ok / max(n, 1)

    history = []
    for epoch in range(args.epochs):
        it = image_folder_batches(train_dir, batch_size, args.img_size,
                                  is_train=True, epochs=1,
                                  seed=args.seed + epoch,
                                  samples=train_files)
        loss = None
        for images, labels in it:
            params, opt, loss = step(params, opt, jnp.asarray(images),
                                     jnp.asarray(labels))
        acc = evaluate()
        history.append(acc)
        print(f"[vision-classify] epoch {epoch}: loss "
              f"{float(loss):.4f} dev acc {acc:.4f}", flush=True)
    out = {"dev_accuracy": history[-1], "history": history,
           "num_classes": num_classes}
    print(out)
    return out


# --------------------------- segmentation -----------------------------------

def init_segformer_head(key, in_dims, embed_dim, num_classes,
                        dtype=np.float32):
    """All-MLP decode head (SegFormer): per-stage linear -> fused linear ->
    classifier."""
    import jax
    import jax.numpy as jnp
    ks = jax.random.split(key, len(in_dims) + 2)
    def lin(k, i, o):
        return {"w": (i ** -0.5 * jax.random.normal(k, (i, o))
                      ).astype(dtype), "b": jnp.zeros((o,), dtype)}
    return {
        "proj": [lin(ks[i], d, embed_dim) for i, d in enumerate(in_dims)],
        "fuse": lin(ks[-2], embed_dim * len(in_dims), embed_dim),
        "cls": lin(ks[-1], embed_dim, num_classes),
    }


def apply_segformer(params, images, cfg, num_classes, *,
                    compute_dtype=None):
    """images [B,H,W,3] -> per-pixel logits [B,H,W,num_classes]."""
    import jax
    import jax.numpy as jnp
    from megatron_clip_tpu.models.mit import apply_mit_features
    compute_dtype = compute_dtype or jnp.float32
    feats = apply_mit_features(params["backbone"], images, cfg,
                               compute_dtype=compute_dtype)
    head = params["head"]
    target = feats[0].shape[1]          # 1/4 resolution
    ups = []
    for f, pr in zip(feats, head["proj"]):
        y = f @ pr["w"].astype(f.dtype) + pr["b"].astype(f.dtype)
        if y.shape[1] != target:
            y = jax.image.resize(
                y, (y.shape[0], target, target, y.shape[-1]), "bilinear")
        ups.append(y)
    y = jnp.concatenate(ups, axis=-1)
    y = jax.nn.gelu(y @ head["fuse"]["w"].astype(y.dtype)
                    + head["fuse"]["b"].astype(y.dtype))
    logits = y @ head["cls"]["w"].astype(y.dtype) \
        + head["cls"]["b"].astype(y.dtype)
    h = images.shape[1]
    logits = jax.image.resize(
        logits, (logits.shape[0], h, h, num_classes), "bilinear")
    return logits.astype(jnp.float32)


def init_setr_head(key, width, embed_dim, num_classes, stages=4,
                   dtype=np.float32):
    """SETR-PUP decode head (tasks/vision/segmentation/finetune_setr.py,
    seg_heads.py SetrSegmentationHead): progressive 2x upsampling stages,
    each a linear + GELU, then a pixel classifier."""
    import jax
    import jax.numpy as jnp
    ks = jax.random.split(key, stages + 1)

    def lin(k, i, o):
        return {"w": (i ** -0.5 * jax.random.normal(k, (i, o))
                      ).astype(dtype), "b": jnp.zeros((o,), dtype)}

    return {"up": [lin(ks[i], width if i == 0 else embed_dim, embed_dim)
                   for i in range(stages)],
            "cls": lin(ks[-1], embed_dim, num_classes)}


def apply_setr(params, images, cfg, num_classes, *, compute_dtype=None):
    """Plain-ViT encoder -> patch-token grid -> PUP head: each stage is
    linear+GELU then 2x bilinear upsample until full resolution."""
    import jax
    import jax.numpy as jnp
    from megatron_clip_tpu.models.vit import apply_vit
    compute_dtype = compute_dtype or jnp.float32
    _, tokens = apply_vit(params["backbone"], images, cfg, cfg.width,
                          compute_dtype=compute_dtype, output_tokens=True)
    grid = cfg.image_size // cfg.patch_size
    b = tokens.shape[0]
    # _global_pool('tok'/'avg') already strips the cls token; 'none' keeps it
    start = tokens.shape[1] - grid * grid
    x = tokens[:, start:].reshape(b, grid, grid, cfg.width)
    head = params["head"]
    size = grid
    for i, st in enumerate(head["up"]):
        x = jax.nn.gelu(x @ st["w"].astype(x.dtype)
                        + st["b"].astype(x.dtype))
        if size < cfg.image_size:
            size = min(cfg.image_size, size * 2)
            x = jax.image.resize(x, (b, size, size, x.shape[-1]),
                                 "bilinear")
    logits = x @ head["cls"]["w"].astype(x.dtype) \
        + head["cls"]["b"].astype(x.dtype)
    if size != cfg.image_size:
        logits = jax.image.resize(
            logits, (b, cfg.image_size, cfg.image_size, num_classes),
            "bilinear")
    return logits.astype(jnp.float32)


# Cityscapes labelId -> trainId (the published Cityscapes metadata table,
# reference tasks/vision/segmentation/cityscapes.py:109-148): 19 train
# classes, everything else (void/rare ids, license plate -1) -> ignore=19
CITYSCAPES_LABEL2TRAIN = {
    7: 0, 8: 1, 11: 2, 12: 3, 13: 4, 17: 5, 19: 6, 20: 7, 21: 8, 22: 9,
    23: 10, 24: 11, 25: 12, 26: 13, 27: 14, 28: 15, 31: 16, 32: 17, 33: 18}
CITYSCAPES_NUM_CLASSES = 19
CITYSCAPES_IGNORE = 19


def _cityscapes_dir(root, kind, split):
    """Accept both the official archive layout (leftImg8bit_trainvaltest/
    leftImg8bit/<split>/<city>) and a flattened leftImg8bit/<split>."""
    for base in (f"{kind}_trainvaltest/{kind}", kind):
        d = os.path.join(root, base, split)
        if os.path.isdir(d):
            return d
    raise FileNotFoundError(f"no {kind}/{split} under {root}")


def _scan_cityscapes(root, split, mode="gtFine"):
    """Cityscapes directory layout -> [(image_path, mask_path)]. Decoding
    is deferred to _decode_seg_batch: the train split at 1024px would be
    ~37 GB as eager float32 arrays (cityscapes.py builds a lazy Dataset
    for the same reason)."""
    img_root = _cityscapes_dir(root, "leftImg8bit", split)
    tgt_root = _cityscapes_dir(root, mode, split)
    pairs = []
    for city in sorted(os.listdir(img_root)):
        cdir = os.path.join(img_root, city)
        for name in sorted(os.listdir(cdir)):
            if not name.endswith("_leftImg8bit.png"):
                continue
            base = name[:-len("_leftImg8bit.png")]
            pairs.append((os.path.join(cdir, name),
                          os.path.join(tgt_root, city,
                                       f"{base}_{mode}_labelIds.png")))
    if not pairs:
        raise FileNotFoundError(f"no *_leftImg8bit.png under {img_root}")
    return pairs


_CITYSCAPES_REMAP = np.full(256, CITYSCAPES_IGNORE, np.int32)
for _k, _v in CITYSCAPES_LABEL2TRAIN.items():
    _CITYSCAPES_REMAP[_k] = _v


def _decode_seg_batch(pairs, img_size, remap=None):
    """[(img_path, mask_path)] -> (images [B,H,W,3] f32, masks [B,H,W] i32),
    with the labelId->trainId remap when given (cityscapes.py:188-195)."""
    from PIL import Image
    xs, ys = [], []
    for img_p, mask_p in pairs:
        im = Image.open(img_p).convert("RGB") \
            .resize((img_size, img_size), Image.BILINEAR)
        mk = Image.open(mask_p).resize((img_size, img_size), Image.NEAREST)
        xs.append(np.asarray(im, np.float32) / 255.0)
        m = np.asarray(mk, np.int64)
        ys.append(remap[m.clip(0, 255)] if remap is not None
                  else m.astype(np.int32))
    return np.stack(xs), np.stack(ys)


def _load_seg_pairs(data_dir, img_size):
    """images/*.png|jpg + masks/<same-name>.png (int label map)."""
    from PIL import Image
    img_dir = os.path.join(data_dir, "images")
    mask_dir = os.path.join(data_dir, "masks")
    names = sorted(os.listdir(img_dir))
    xs, ys = [], []
    for n in names:
        im = Image.open(os.path.join(img_dir, n)).convert("RGB") \
            .resize((img_size, img_size), Image.BILINEAR)
        base = os.path.splitext(n)[0]
        mp = os.path.join(mask_dir, base + ".png")
        mk = Image.open(mp).resize((img_size, img_size), Image.NEAREST)
        xs.append(np.asarray(im, np.float32) / 255.0)
        ys.append(np.asarray(mk, np.int32))
    return np.stack(xs), np.stack(ys)


def run_vision_segment(args):
    """Semantic-segmentation finetune on an images/+masks/ folder; reports
    mIoU. --seg-arch segformer (MiT + all-MLP head) or setr (plain ViT +
    progressive-upsampling head) — the reference's two harnesses
    (finetune_segformer.py / finetune_setr.py)."""
    import jax
    import jax.numpy as jnp
    import optax
    from megatron_clip_tpu.ops.cross_entropy import cross_entropy
    from megatron_clip_tpu.training.optim import make_optimizer, cosine_lr

    cityscapes = getattr(args, "seg_dataset", "folder") == "cityscapes"
    if cityscapes:
        num_classes = CITYSCAPES_NUM_CLASSES
        ignore = CITYSCAPES_IGNORE
    else:
        num_classes = args.num_classes or 21
        ignore = args.ignore_index
    key = jax.random.PRNGKey(args.seed)
    kb, kh = jax.random.split(key)
    if getattr(args, "seg_arch", "segformer") == "setr":
        from megatron_clip_tpu.config import VisionCfg
        from megatron_clip_tpu.models.vit import init_vit
        cfg = VisionCfg(layers=args.num_layers, width=args.hidden_size,
                        patch_size=args.patch_size,
                        image_size=args.img_size)
        params = {
            "backbone": init_vit(kb, cfg, cfg.width),
            "head": init_setr_head(kh, cfg.width, args.seg_embed_dim,
                                   num_classes),
        }
        params["backbone"]["proj"] = jnp.eye(cfg.width, dtype=jnp.float32)
        apply_fn = apply_setr
    else:
        from megatron_clip_tpu.models.mit import MiTCfg, init_mit
        cfg = MiTCfg(image_size=args.img_size,
                     dims=tuple(args.seg_dims) if args.seg_dims else
                     (32, 64, 160, 256),
                     depths=tuple(args.seg_depths) if args.seg_depths else
                     (2, 2, 2, 2))
        params = {
            "backbone": init_mit(kb, cfg, num_classes=0),
            "head": init_segformer_head(kh, cfg.dims, args.seg_embed_dim,
                                        num_classes),
        }
        apply_fn = apply_segformer

    if cityscapes:
        pairs = _scan_cityscapes(args.data_dir,
                                 getattr(args, "seg_split", "train"))
        remap = _CITYSCAPES_REMAP
    else:
        xs_, ys_ = _load_seg_pairs(args.data_dir, args.img_size)
        pairs, remap = None, None
    if pairs is not None:
        n = len(pairs)

        def batch_at(idx):
            return _decode_seg_batch([pairs[i] for i in idx], args.img_size,
                                     remap)
    else:
        n = len(xs_)

        def batch_at(idx):
            return xs_[idx], ys_[idx]
    steps_per_epoch = max(1, n // args.batch_size)
    total = steps_per_epoch * args.epochs
    tx = make_optimizer(params, cosine_lr(args.lr, min(10, total // 10),
                                          total),
                        weight_decay=0.01, grad_clip_norm=1.0)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, images, masks):
        def lf(p):
            logits = apply_fn(p, images, cfg, num_classes)
            per = cross_entropy(logits.reshape(-1, num_classes),
                                masks.reshape(-1).clip(0))
            valid = (masks.reshape(-1) != ignore).astype(jnp.float32)
            return jnp.sum(per * valid) / jnp.maximum(valid.sum(), 1.0)
        loss, g = jax.value_and_grad(lf)(params)
        u, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, u), opt, loss

    @jax.jit
    def predict(params, images):
        return jnp.argmax(apply_fn(params, images, cfg, num_classes), -1)

    rng = np.random.RandomState(args.seed)
    loss = None
    for epoch in range(args.epochs):
        order = rng.permutation(n)
        for i in range(steps_per_epoch):
            idx = order[i * args.batch_size:(i + 1) * args.batch_size]
            if len(idx) < args.batch_size:
                idx = np.concatenate(
                    [idx, order[:args.batch_size - len(idx)]])
            bx, by = batch_at(idx)
            params, opt, loss = step(params, opt, jnp.asarray(bx),
                                     jnp.asarray(by))
        print(f"[vision-segment] epoch {epoch}: loss {float(loss):.4f}",
              flush=True)

    # mIoU over the (small) eval set (cityscapes.py evaluation contract)
    inter = np.zeros(num_classes)
    union = np.zeros(num_classes)
    for i in range(0, n, args.batch_size):
        b, gt = batch_at(np.arange(i, min(i + args.batch_size, n)))
        pred = np.asarray(predict(params, jnp.asarray(b)))
        valid = gt != ignore
        for c in range(num_classes):
            pi = (pred == c) & valid
            gi = (gt == c) & valid
            inter[c] += (pi & gi).sum()
            union[c] += (pi | gi).sum()
    present = union > 0
    miou = float((inter[present] / union[present]).mean()) if present.any() \
        else 0.0
    out = {"train_loss": float(loss), "miou": round(miou, 4),
           "num_classes": num_classes}
    print(out)
    return out
