"""Branch-parallel CLIP: the fork's signature capability, completed.

The reference splits the GPU world into a *main branch* (vision tower) and an
*extra branch* (text tower), each with independent TP/PP/DP sizes
(megatron/core/parallel_state.py:99-241, `--extra-world-size`,
`--xtensor/xpipeline-model-parallel-size`, arguments.py:1114-1123), but never
finished the cross-branch contrastive join: `pretrain_CLIP.py:115`'s
two-tower loss_func is signature-incompatible with the pipeline scheduler and
no cross-branch feature exchange exists (SURVEY.md §0). The design notes it
left behind (DeepSpeed PipelineCLIP's loss-as-final-stage,
open_CLIP/src/open_clip/refined_model.py:902-981, and the split-backward
trick in open_CLIP/tests/test_interrupt_backward.py:5-12) are completed here
the JAX way:

  - each tower lives on its own `Mesh` over a disjoint device subset, with
    its own (dp, fsdp, tp, pp) layout;
  - tower forwards are separate jit computations -> they run CONCURRENTLY
    (async dispatch onto disjoint devices);
  - features hop meshes via `jax.device_put` resharding (ICI transfer);
  - the join computes global-batch InfoNCE + d(loss)/d(features);
  - feature cotangents are routed back into each tower's backward via
    `jax.vjp` — the functional, gradient-exact form of the reference's
    interrupted-backward trick.
"""
from dataclasses import dataclass
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from megatron_clip_tpu.config import BranchParallelCfg, CLIPCfg
from megatron_clip_tpu.losses import clip_loss
from megatron_clip_tpu.models.clip import LOGIT_SCALE_MAX
from megatron_clip_tpu.models.vit import apply_vit
from megatron_clip_tpu.models.text import apply_text
from megatron_clip_tpu.parallel.mesh import build_mesh, DATA, FSDP
from megatron_clip_tpu.parallel.sharding import clip_param_specs, make_sharding_tree


class BranchState(NamedTuple):
    vision: Any        # (params, opt_state)
    text: Any
    head: Any          # (params={'logit_scale': ...}, opt_state)
    step: jax.Array


class _Branch:
    """One tower on one mesh: two compiled dispatches per step.

    fwd(params, batch) -> features is one jit; bwd_update(params, opt,
    batch, cotangent) -> (params', opt') is a second jit that recomputes
    the forward inside the vjp and applies the optimizer in the same
    computation. The recompute (one extra tower forward) replaces the
    previous eager `jax.vjp` orchestration, which executed the whole
    tower op-by-op from the host — hundreds of dispatches per step. At
    scale the recompute is the same contract as megatron's activation
    recompute (the reference trains branch-parallel CLIP with
    --recompute-granularity anyway); with cfg remat enabled the cost is
    already paid."""

    def __init__(self, mesh: Mesh, fwd: Callable, tx, accum: int = 1):
        self.mesh = mesh
        self.tx = tx
        self.accum = max(1, accum)
        self._fwd_fn = fwd
        self.fwd = jax.jit(fwd)
        self.bwd_update = jax.jit(self._bwd_update_impl,
                                  donate_argnums=(0, 1))

    def _bwd_update_impl(self, params, opt_state, batch, cotangent):
        if self.accum > 1:
            # open_CLIP --accum-freq in the branch step: the tower forward
            # is per-sample independent, so the backward may run in
            # microbatch chunks with the join's cotangent slices — grads
            # sum to the exact full-batch gradient while peak activation
            # memory drops by the accum factor (train.py:405-443 semantics;
            # exactness holds because the batch coupling lives in the join,
            # which already produced these cotangents).
            a = self.accum
            b = batch.shape[0]
            if b % a:
                raise ValueError(f"per-step batch {b} not divisible by "
                                 f"accum_freq {a}")
            bm = batch.reshape(a, b // a, *batch.shape[1:])
            cm = cotangent.reshape(a, b // a, *cotangent.shape[1:])

            def chunk(acc, xs):
                bb, cc = xs
                _, vjp = jax.vjp(self._fwd_fn, params, bb)
                return jax.tree.map(jnp.add, acc, vjp(cc)[0]), None

            zeros = jax.tree.map(lambda x: jnp.zeros_like(x), params)
            grads, _ = jax.lax.scan(chunk, zeros, (bm, cm))
        else:
            _, vjp = jax.vjp(self._fwd_fn, params, batch)
            grads = vjp(cotangent)[0]
        updates, opt_state = self.tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    def batch_sharding(self):
        return NamedSharding(self.mesh, P((DATA, FSDP)))


@dataclass
class BranchParallelCLIP:
    """Orchestrates the two-tower, two-mesh train step.

    Per step, six compiled computations are dispatched (all async):
      vision_fwd | text_fwd          (concurrent, disjoint meshes)
      join (loss + feature grads, on the vision mesh)
      vision_bwd+update | text_bwd+update  (concurrent, fwd recomputed
                                            inside the vjp — see _Branch)
      head update
    """

    cfg: CLIPCfg
    bp: BranchParallelCfg
    compute_dtype: Any = jnp.bfloat16
    remat: str = "none"
    devices: Optional[list] = None
    accum_freq: int = 1   # open_CLIP --accum-freq: chunked tower backward
    local_loss: bool = True  # per-shard logit rows with offset labels in the
    # join (open_CLIP loss.py:95-121) instead of the full [N, N] matrix —
    # at a 32k global batch the full fp32 logit matrix is ~4 GB; local rows
    # are 1/shards of that. False = the plain global join (parity oracle).

    def __post_init__(self):
        devices = list(self.devices if self.devices is not None else jax.devices())
        nv = self.bp.vision.num_devices
        self.vision_mesh = build_mesh(self.bp.vision, devices[:nv])
        if self.bp.text is not None:
            nt = self.bp.text.num_devices
            if len(devices) < nv + nt:
                raise ValueError(
                    f"need {nv}+{nt} devices, have {len(devices)} "
                    f"(extra_world_size analogue, parallel_state.py:99)")
            self.text_mesh = build_mesh(self.bp.text, devices[nv:nv + nt])
        else:
            self.text_mesh = self.vision_mesh

        cfg = self.cfg
        # Under vpp>1 each tower's stacked layers are placed ONCE in
        # vpp_arrange physical order (stage s's contiguous leading-dim shard
        # = its round-robin chunks), same zero-copy placement as the joint
        # runner — the schedule then reads weights with no per-step
        # cross-stage permute. init_state applies the arrangement;
        # to_logical_state/to_physical_state convert for checkpoints/eval.
        from megatron_clip_tpu.parallel.pipeline import make_pipelined_layers_fn
        v_pp, v_vpp = self.bp.vision.pp, self.bp.vision.vpp
        self._v_vpp = (v_pp, v_vpp) if v_pp > 1 and v_vpp > 1 else None
        v_layers_fn = (make_pipelined_layers_fn(
            self.vision_mesh, self.bp.vision.microbatches, v_vpp,
            vpp_prearranged=self._v_vpp is not None)
            if v_pp > 1 else None)
        t_pp = self.bp.text.pp if self.bp.text is not None else 1
        t_vpp = self.bp.text.vpp if self.bp.text is not None else 1
        self._t_vpp = (t_pp, t_vpp) if t_pp > 1 and t_vpp > 1 else None
        t_layers_fn = (make_pipelined_layers_fn(
            self.text_mesh, self.bp.text.microbatches, t_vpp,
            vpp_prearranged=self._t_vpp is not None)
            if t_pp > 1 else None)

        from megatron_clip_tpu.models.clip import _l2_normalize

        def vision_fwd(vparams, images):
            tcfg = cfg.vision.transformer(act=cfg.act, remat=self.remat)
            f = apply_vit(vparams, images, cfg.vision, cfg.embed_dim,
                          act=cfg.act, tcfg=tcfg, layers_fn=v_layers_fn,
                          compute_dtype=self.compute_dtype)
            return _l2_normalize(f)   # same fp32 F.normalize as the joint model

        def text_fwd(tparams, texts):
            tcfg = cfg.text.transformer(act=cfg.act, remat=self.remat)
            f = apply_text(tparams, texts, cfg.text, cfg.embed_dim,
                           act=cfg.act, tcfg=tcfg, layers_fn=t_layers_fn,
                           compute_dtype=self.compute_dtype)
            return _l2_normalize(f)

        self._tx = None  # set in init_state
        self._vision = None
        self._text = None
        self._vision_fwd = vision_fwd
        self._text_fwd = text_fwd
        self._join = jax.jit(self._join_local_impl if self.local_loss
                             else self._join_impl)

    # ---- join: global-batch InfoNCE + feature/head gradients --------------
    @staticmethod
    def _join_impl(head_params, img_feats, txt_feats):
        def loss_fn(hp, fi, ft):
            scale = jnp.exp(jnp.minimum(hp["logit_scale"], LOGIT_SCALE_MAX))
            return clip_loss(fi, ft, scale)

        loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2))(
            head_params, img_feats, txt_feats)
        d_head, d_img, d_txt = grads
        return loss, d_head, d_img, d_txt

    def _join_local_impl(self, head_params, img_feats, txt_feats):
        """local_loss join (open_CLIP loss.py:95-121 semantics, shard_map
        form): each (data, fsdp) shard of the vision mesh all-gathers the
        features (differentiable gather == --gather-with-grad), computes
        only ITS logit rows [n_local, N] with labels offset by
        shard_index * n_local, and pmeans the loss. The full [N, N] logit
        matrix never materializes on any device — per-device logits are
        1/shards of it. Gradients are exact: the all-gather's transpose is
        reduce-scatter, so d_img/d_txt come back shard-local."""
        from megatron_clip_tpu.losses import ClipLoss
        axes = (DATA, FSDP)
        loss_obj = ClipLoss(local_loss=True, gather_with_grad=True,
                            axis_name=axes)
        spec = P(axes)

        def shard_fn(hp, fi, ft):
            def loss_fn(hp, fi, ft):
                scale = jnp.exp(jnp.minimum(hp["logit_scale"],
                                            LOGIT_SCALE_MAX))
                return loss_obj(fi, ft, scale)

            loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2))(
                hp, fi, ft)
            d_head, d_img, d_txt = grads
            # hp is replicated; the pmean'd loss's hp-grad arrives as this
            # shard's contribution — psum makes it the replicated global
            # gradient (and /n is already inside the pmean)
            d_head = jax.tree.map(lambda g: jax.lax.psum(g, axes), d_head)
            return loss, d_head, d_img, d_txt

        return jax.shard_map(
            shard_fn, mesh=self.vision_mesh,
            in_specs=(P(), spec, spec),
            out_specs=(P(), P(), spec, spec))(head_params, img_feats,
                                              txt_feats)

    # ---- state -------------------------------------------------------------
    def init_state(self, rng, tx_factory: Callable[[Any], Any]) -> BranchState:
        from megatron_clip_tpu.models.clip import init_clip
        params = init_clip(rng, self.cfg)
        head_params = {"logit_scale": params.pop("logit_scale")}
        vparams, tparams = params["visual"], params["text"]

        # interleaved vpp: place each tower's stacked layers in vpp_arrange
        # physical order once (zero-copy schedule reads; checkpoints/eval
        # stay logical via to_logical_state)
        from megatron_clip_tpu.parallel.pipeline import vpp_arrange
        if self._v_vpp is not None:
            vparams = dict(vparams, blocks=vpp_arrange(
                vparams["blocks"], *self._v_vpp))
        if self._t_vpp is not None:
            tparams = dict(tparams, blocks=vpp_arrange(
                tparams["blocks"], *self._t_vpp))

        from megatron_clip_tpu.parallel.mesh import STAGE
        v_stage = STAGE if self.bp.vision.pp > 1 else None
        t_stage = STAGE if (self.bp.text is not None and self.bp.text.pp > 1) else None
        vspecs = clip_param_specs({"visual": vparams}, stage_axis=v_stage)["visual"]
        tspecs = clip_param_specs({"text": tparams}, stage_axis=t_stage)["text"]
        vparams = jax.device_put(vparams, make_sharding_tree(self.vision_mesh, vspecs))
        tparams = jax.device_put(tparams, make_sharding_tree(self.text_mesh, tspecs))
        head_params = jax.device_put(
            head_params, NamedSharding(self.vision_mesh, P()))

        # tell the factory WHICH tower each subtree is (the LiT lock mask
        # keys off "visual"/"text" top-level names, which per-tower subtrees
        # don't carry); plain single-arg factories are called as-is.
        # _call_tx_factory also honors **kwargs factories (VAR_KEYWORD) —
        # a local "tower in parameters" probe would silently drop the hint
        # for `def f(p, **kw)` and no-op --lock-* in branch mode
        from megatron_clip_tpu.training.loop import _call_tx_factory

        def _tx(p, tower):
            # per-layer lock masks must follow the tower's PHYSICAL layer
            # order under vpp_arrange (the joint runner's vpp_layout hint)
            layout = {"visual": self._v_vpp, "text": self._t_vpp}.get(tower)
            return _call_tx_factory(tx_factory, p, tower=tower,
                                    vpp_layout=layout)

        v_tx, t_tx, h_tx = (_tx(vparams, "visual"), _tx(tparams, "text"),
                            _tx(head_params, None))
        self._vision = _Branch(self.vision_mesh, self._vision_fwd, v_tx,
                               accum=self.accum_freq)
        self._text = _Branch(self.text_mesh, self._text_fwd, t_tx,
                             accum=self.accum_freq)
        self._head_tx = h_tx
        self._head_update = jax.jit(
            lambda p, s, g: self._head_update_impl(h_tx, p, s, g),
            donate_argnums=(0, 1))

        return BranchState(
            vision=(vparams, v_tx.init(vparams)),
            text=(tparams, t_tx.init(tparams)),
            head=(head_params, h_tx.init(head_params)),
            step=jnp.zeros((), jnp.int32),
        )

    @staticmethod
    def _head_update_impl(tx, params, opt_state, grads):
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        params["logit_scale"] = jnp.clip(params["logit_scale"], 0.0,
                                         LOGIT_SCALE_MAX)
        return params, opt_state

    # ---- vpp physical <-> logical layout hops ------------------------------
    def _map_tower_blocks(self, tower_state, tx, layout, leaf_fn):
        """Map (params, opt_state)'s stacked blocks with leaf_fn, mirroring
        the optimizer leaves via optax.tree_map_params (the joint runner's
        _map_blocks, per tower)."""
        params, opt_state = tower_state
        if layout is None or "blocks" not in params:
            return tower_state
        tags = jax.tree.map(lambda _: False, params)
        tags = dict(tags, blocks=jax.tree.map(lambda _: True,
                                              params["blocks"]))

        def f(leaf, tag):
            if not tag:
                return leaf
            out = leaf_fn(leaf)
            if hasattr(leaf, "sharding"):
                out = jax.device_put(out, leaf.sharding)
            return out

        return (jax.tree.map(f, params, tags),
                optax.tree_map_params(tx, f, opt_state, tags))

    def _layout_hop(self, state: BranchState, restore: bool) -> BranchState:
        import numpy as np
        from megatron_clip_tpu.parallel.pipeline import vpp_layer_order

        def mk(layout):
            def leaf_fn(leaf):
                order = vpp_layer_order(leaf.shape[0], *layout)
                return leaf[np.argsort(order)] if restore else leaf[order]
            return leaf_fn

        vision, text = state.vision, state.text
        if self._v_vpp is not None:
            vision = self._map_tower_blocks(vision, self._vision.tx,
                                            self._v_vpp, mk(self._v_vpp))
        if self._t_vpp is not None:
            text = self._map_tower_blocks(text, self._text.tx,
                                          self._t_vpp, mk(self._t_vpp))
        return state._replace(vision=vision, text=text)

    def to_logical_state(self, state: BranchState) -> BranchState:
        """In-memory vpp_arrange physical order -> logical layer order (the
        layout-independent checkpoint/eval form)."""
        return self._layout_hop(state, restore=True)

    def to_physical_state(self, state: BranchState) -> BranchState:
        return self._layout_hop(state, restore=False)

    def eval_params(self, state: BranchState):
        """Full CLIP param tree gathered (replicated) onto the vision mesh —
        the form the evaluation harness consumes via CLIPModel(params, ...),
        in LOGICAL layer order (the eval apply is unpipelined).
        The reference's branch eval requires cross-branch gathers too
        (open_CLIP main.py epoch eval with the DDP model)."""
        state = self.to_logical_state(state)
        repl = NamedSharding(self.vision_mesh, P())
        return {
            "visual": jax.device_put(state.vision[0], repl),
            "text": jax.device_put(state.text[0], repl),
            "logit_scale": jax.device_put(
                state.head[0]["logit_scale"], repl),
        }

    # ---- the step ----------------------------------------------------------
    def train_step(self, state: BranchState, images, texts):
        """Six compiled dispatches: vision_fwd | text_fwd (concurrent,
        disjoint meshes) -> join -> vision_bwd+update | text_bwd+update
        (concurrent) -> head update; the four feature/cotangent hops are
        cross-mesh ICI reshards (device_put). Everything is dispatched
        asynchronously — the host never blocks inside the step."""
        v, t = self._vision, self._text
        images = jax.device_put(images, v.batch_sharding())
        texts = jax.device_put(texts, t.batch_sharding())

        # concurrent tower forwards (disjoint devices, async dispatch)
        img_feats = v.fwd(state.vision[0], images)
        txt_feats = t.fwd(state.text[0], texts)

        # features hop to the vision mesh for the join (ICI reshard)
        join_shard = NamedSharding(self.vision_mesh, P((DATA, FSDP)))
        txt_on_v = jax.device_put(txt_feats, join_shard)
        img_on_v = jax.device_put(img_feats, join_shard)

        loss, d_head, d_img, d_txt = self._join(state.head[0], img_on_v, txt_on_v)

        # route feature cotangents back into each tower's backward+update
        d_img_v = jax.device_put(d_img, img_feats.sharding)
        d_txt_t = jax.device_put(d_txt, txt_feats.sharding)
        vparams, vopt = v.bwd_update(state.vision[0], state.vision[1],
                                     images, d_img_v)
        tparams, topt = t.bwd_update(state.text[0], state.text[1],
                                     texts, d_txt_t)
        hparams, hopt = self._head_update(state.head[0], state.head[1], d_head)

        new_state = BranchState(vision=(vparams, vopt), text=(tparams, topt),
                                head=(hparams, hopt), step=state.step + 1)
        metrics = {"loss": loss,
                   "logit_scale": jnp.exp(jnp.minimum(
                       hparams["logit_scale"], LOGIT_SCALE_MAX))}
        return new_state, metrics
