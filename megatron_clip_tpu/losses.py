"""Contrastive losses.

Replaces open_CLIP's losses (open_CLIP/src/open_clip/loss.py:20-221). The
key distributed capability — global-batch InfoNCE with feature all-gather —
maps to TPU as follows:

  - Under plain `jit` with batch-sharded features, calling `clip_loss` on the
    global arrays lets XLA insert the all-gather/all-reduce over ICI itself.
  - Under `shard_map` (explicit-collective path, used by the pipeline/branch
    runtime), `ClipLoss` with an `axis_name` reproduces the reference's
    `gather_features` exactly: `jax.lax.all_gather` is differentiable (its
    transpose is reduce-scatter), which *is* `--gather-with-grad`; the
    grad-blocked variant reinserts the local shard into a stop-gradient
    gather (loss.py:43-60). `local_loss=True` computes only the local rows
    of the logit matrix with labels offset by `rank * B` (loss.py:95-121),
    avoiding the (B·W)² logits on every device.
"""
from typing import Optional

import jax
import jax.numpy as jnp


def _xent(logits, labels):
    """Cross entropy with integer labels; logits promoted to fp32."""
    logits = logits.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
    return logz - gold


def clip_loss(image_features, text_features, logit_scale,
              labels: Optional[jax.Array] = None):
    """Global (already-gathered) InfoNCE. features: [N, D] L2-normalized."""
    logits_per_image = logit_scale * image_features @ text_features.T
    if labels is None:
        labels = jnp.arange(image_features.shape[0], dtype=jnp.int32)
    li = _xent(logits_per_image, labels).mean()
    lt = _xent(logits_per_image.T, labels).mean()
    return 0.5 * (li + lt)


def gather_features(image_features, text_features, axis_name: str,
                    gather_with_grad: bool = True):
    """All-gather features across the named mesh axis (inside shard_map).

    Mirrors open_CLIP `gather_features` (loss.py:20-64). With
    gather_with_grad=False, the gathered copies are stop-gradiented and the
    local shard is re-inserted so only local features carry gradient.
    """
    def gather(x):
        g = jax.lax.all_gather(x, axis_name, tiled=True)
        if not gather_with_grad:
            idx = jax.lax.axis_index(axis_name)
            b = x.shape[0]
            g = jax.lax.dynamic_update_slice_in_dim(
                jax.lax.stop_gradient(g), x, idx * b, axis=0)
        return g
    return gather(image_features), gather(text_features)


class ClipLoss:
    """Callable matching open_CLIP's ClipLoss(loss.py:67-141) contract.

    Use with axis_name=None outside shard_map (single-device or jit-sharded),
    or with axis_name="data" inside shard_map for explicit collectives.
    """

    def __init__(self, local_loss: bool = True, gather_with_grad: bool = True,
                 axis_name: Optional[str] = None):
        self.local_loss = local_loss
        self.gather_with_grad = gather_with_grad
        self.axis_name = axis_name

    def get_logits(self, image_features, text_features, logit_scale):
        if self.axis_name is None:
            lpi = logit_scale * image_features @ text_features.T
            return lpi, lpi.T
        all_img, all_txt = gather_features(
            image_features, text_features, self.axis_name, self.gather_with_grad)
        if self.local_loss:
            lpi = logit_scale * image_features @ all_txt.T   # [B, B*W]
            lpt = logit_scale * text_features @ all_img.T    # [B, B*W]
        else:
            lpi = logit_scale * all_img @ all_txt.T          # [B*W, B*W]
            lpt = lpi.T
        return lpi, lpt

    def get_ground_truth(self, num_logits: int, local_batch: int):
        labels = jnp.arange(local_batch if self.local_loss and self.axis_name
                            else num_logits, dtype=jnp.int32)
        if self.axis_name is not None and self.local_loss:
            labels = labels + jax.lax.axis_index(self.axis_name) * local_batch
        return labels

    def __call__(self, image_features, text_features, logit_scale,
                 output_dict: bool = False):
        lpi, lpt = self.get_logits(image_features, text_features, logit_scale)
        labels = self.get_ground_truth(lpi.shape[-1], image_features.shape[0])
        loss = 0.5 * (_xent(lpi, labels).mean() + _xent(lpt, labels).mean())
        if self.axis_name is not None:
            # every shard holds a mean over its rows; average across shards so
            # the value equals the global-batch mean
            loss = jax.lax.pmean(loss, self.axis_name)
        return {"contrastive_loss": loss} if output_dict else loss


class SigLipLoss:
    """Sigmoid pairwise loss (SigLIP) — no all-gather needed; negatives are
    exchanged with a ring `ppermute` across the data axis, the TPU-native
    version of SigLIP's neighbour exchange. BASELINE.json config 5.
    """

    def __init__(self, axis_name: Optional[str] = None):
        self.axis_name = axis_name

    @staticmethod
    def _pair_loss(img, txt, logit_scale, logit_bias, positive: bool):
        logits = logit_scale * img @ txt.T
        if logit_bias is not None:
            logits = logits + logit_bias
        n = img.shape[0]
        sign = (2.0 * jnp.eye(n, dtype=jnp.float32) - 1.0) if positive \
            else -jnp.ones((n, logits.shape[1]), dtype=jnp.float32)
        return -jnp.sum(jax.nn.log_sigmoid(sign * logits.astype(jnp.float32))) / n

    def __call__(self, image_features, text_features, logit_scale,
                 logit_bias=None, output_dict: bool = False):
        loss = self._pair_loss(image_features, text_features, logit_scale,
                               logit_bias, positive=True)
        if self.axis_name is not None:
            w = jax.lax.axis_size(self.axis_name)
            perm = [(i, (i + 1) % w) for i in range(w)]
            txt = text_features
            for step in range(1, w):
                txt = jax.lax.ppermute(txt, self.axis_name, perm)
                loss = loss + self._pair_loss(
                    image_features, txt, logit_scale, logit_bias, positive=False)
            loss = jax.lax.pmean(loss, self.axis_name)
        return {"contrastive_loss": loss} if output_dict else loss


class CoCaLoss(ClipLoss):
    """CLIP contrastive + captioning cross-entropy
    (open_CLIP/src/open_clip/loss.py:143-183)."""

    def __init__(self, caption_loss_weight: float = 2.0,
                 clip_loss_weight: float = 1.0, pad_id: int = 0, **kw):
        super().__init__(**kw)
        self.caption_loss_weight = caption_loss_weight
        self.clip_loss_weight = clip_loss_weight
        self.pad_id = pad_id

    def __call__(self, image_features, text_features, logits, labels,
                 logit_scale, output_dict: bool = False):
        clip_l = jnp.asarray(0.0, jnp.float32)
        if self.clip_loss_weight:
            clip_l = self.clip_loss_weight * super().__call__(
                image_features, text_features, logit_scale)
        mask = (labels != self.pad_id).astype(jnp.float32)
        per_tok = _xent(logits.reshape(-1, logits.shape[-1]), labels.reshape(-1))
        cap_l = jnp.sum(per_tok * mask.reshape(-1)) / jnp.maximum(mask.sum(), 1.0)
        cap_l = self.caption_loss_weight * cap_l
        if self.axis_name is not None:
            # like the inherited contrastive term: each shard's caption loss
            # is a local-row mean; average across shards so the value (and
            # the gradient scale) matches the global-batch mean
            cap_l = jax.lax.pmean(cap_l, self.axis_name)
        if output_dict:
            return {"contrastive_loss": clip_l, "caption_loss": cap_l}
        return clip_l, cap_l


class DistillClipLoss(ClipLoss):
    """Contrastive loss + distillation from a teacher CLIP
    (open_CLIP/src/open_clip/loss.py:185-221): soft cross-entropy between
    the student's and teacher's logit distributions, both directions."""

    @staticmethod
    def _soft_xent(student_logits, teacher_logits):
        pt = jax.nn.softmax(teacher_logits.astype(jnp.float32), axis=-1)
        logps = jax.nn.log_softmax(student_logits.astype(jnp.float32), axis=-1)
        return -(pt * logps).sum(-1).mean()

    def __call__(self, image_features, text_features, logit_scale,
                 dist_image_features=None, dist_text_features=None,
                 dist_logit_scale=None, output_dict: bool = False):
        if dist_image_features is None:
            contrastive = super().__call__(image_features, text_features,
                                           logit_scale)
            return ({"contrastive_loss": contrastive} if output_dict
                    else contrastive)
        # compute the student logits (and their feature all-gather) ONCE and
        # derive both terms from them — calling super().__call__ separately
        # would duplicate the gather + logit matmuls and rely on XLA CSE to
        # merge them
        s_lpi, s_lpt = self.get_logits(image_features, text_features,
                                       logit_scale)
        labels = self.get_ground_truth(s_lpi.shape[-1],
                                       image_features.shape[0])
        contrastive = 0.5 * (_xent(s_lpi, labels).mean()
                             + _xent(s_lpt, labels).mean())
        if self.axis_name is not None:
            contrastive = jax.lax.pmean(contrastive, self.axis_name)
        t_lpi, t_lpt = self.get_logits(dist_image_features,
                                       dist_text_features, dist_logit_scale)
        t_lpi = jax.lax.stop_gradient(t_lpi)
        t_lpt = jax.lax.stop_gradient(t_lpt)
        distill = 0.5 * (self._soft_xent(s_lpi, t_lpi)
                         + self._soft_xent(s_lpt, t_lpt))
        if self.axis_name is not None:
            # local-row mean -> cross-shard mean, matching the contrastive
            # term (otherwise the distill gradient is axis_size x heavier
            # than open_CLIP's DDP-averaged reference)
            distill = jax.lax.pmean(distill, self.axis_name)
        if output_dict:
            return {"contrastive_loss": contrastive, "distill_loss": distill}
        return contrastive, distill
