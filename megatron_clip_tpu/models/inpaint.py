"""Vision inpainting pretraining: masked-patch reconstruction.

Covers the reference's inpainting workload (megatron/model/vision/
inpainting.py ~152 LoC + pretrain_vision_inpaint.py): random patches are
masked out, the ViT encodes the corrupted image (masked patches replaced
by a learned mask token after patch embedding), and a linear head
reconstructs the original pixels of the masked patches; the loss is MSE
over masked positions only.
"""
import jax
import jax.numpy as jnp

from megatron_clip_tpu.config import VisionCfg
from megatron_clip_tpu.models.vit import init_vit
from megatron_clip_tpu.nn.transformer import apply_transformer, apply_norm


def init_inpaint(key, cfg: VisionCfg, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    params = init_vit(k1, cfg, embed_dim=cfg.width, dtype=dtype)
    params.pop("proj", None)
    p = cfg.patch_size
    params["mask_token"] = (0.02 * jax.random.normal(
        k2, (cfg.width,))).astype(dtype)
    params["decoder"] = {
        "w": (0.02 * jax.random.normal(
            k3, (cfg.width, p * p * 3))).astype(dtype),
        "b": jnp.zeros((p * p * 3,), dtype=dtype),
    }
    return params


def _patchify(images, p):
    b, h, w, c = images.shape
    g = h // p
    x = images.reshape(b, g, p, g, p, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, g * g, p * p * c)


def random_patch_mask(rng, batch: int, num_patches: int, mask_ratio: float):
    """[B, N] bool mask: True = masked. Exactly round(N*ratio) per row."""
    n_mask = int(round(num_patches * mask_ratio))
    noise = jax.random.uniform(rng, (batch, num_patches))
    order = jnp.argsort(noise, axis=-1)
    ranks = jnp.argsort(order, axis=-1)
    return ranks < n_mask


def apply_inpaint(params, images, mask, cfg: VisionCfg, *,
                  compute_dtype=jnp.bfloat16):
    """images [B,H,W,3], mask [B,N] -> reconstructed patches [B, N, p*p*3]."""
    p = cfg.patch_size
    patches = _patchify(images, p).astype(compute_dtype)
    x = patches @ params["patch_embed"]["w"].astype(compute_dtype)
    x = jnp.where(mask[..., None], params["mask_token"].astype(x.dtype), x)
    # cls + pos (reuse the CLIP ViT parameterization)
    cls = jnp.broadcast_to(params["cls"].astype(x.dtype),
                           (x.shape[0], 1, x.shape[-1]))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"].astype(x.dtype)[None, : x.shape[1]]
    if "ln_pre" in params:
        x = apply_norm(params["ln_pre"], x)
    tcfg = cfg.transformer()
    x = apply_transformer(params["blocks"], x, tcfg, causal=False)
    x = apply_norm(params["ln_post"], x)
    tokens = x[:, 1:]
    rec = tokens @ params["decoder"]["w"].astype(tokens.dtype) \
        + params["decoder"]["b"].astype(tokens.dtype)
    return rec.astype(jnp.float32)


def inpaint_loss(params, images, mask, cfg: VisionCfg, *,
                 compute_dtype=jnp.bfloat16):
    """MSE over masked patches (inpainting.py loss on corrupted regions)."""
    p = cfg.patch_size
    target = _patchify(images, p)
    rec = apply_inpaint(params, images, mask, cfg,
                        compute_dtype=compute_dtype)
    err = jnp.square(rec - target).mean(axis=-1)          # [B, N]
    m = mask.astype(jnp.float32)
    return jnp.sum(err * m) / jnp.maximum(m.sum(), 1.0)
