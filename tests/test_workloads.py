"""The shared mesh runtime for secondary workloads (training/workload.py):
sharded training, checkpoint save/resume equivalence, and eval cadence —
the contract of megatron's pretrain() (training.py:60) + checkpointing
(checkpointing.py:241,525) + the resume-equivalence functional test
(test_resume_checkpoint_pipeline.py)."""
import numpy as np
import pytest


BERT_COMMON = ["--num-layers", "2", "--hidden-size", "64", "--num-heads",
               "4", "--seq-length", "32", "--vocab-size", "256",
               "--batch-size", "8", "--log-interval", "1",
               "--precision", "fp32", "--seed", "7"]
GPT_COMMON = ["--num-layers", "2", "--hidden-size", "64", "--num-heads", "4",
              "--seq-length", "32", "--vocab-size", "256",
              "--batch-size", "8", "--log-interval", "1",
              "--precision", "fp32", "--seed", "3"]


def test_bert_sharded_with_pipeline_and_dropout(devices8):
    """BERT on the full mesh: tp2 x pp2 x dp2, mb2, hidden dropout — the
    parallel surface megatron's pretrain_bert gets from pretrain()."""
    from pretrain_bert import parse_args, run
    m = run(parse_args(BERT_COMMON[:-2] + [
        "--num-layers", "4", "--train-steps", "3",
        "--tensor-model-parallel-size", "2",
        "--pipeline-model-parallel-size", "2", "--num-microbatches", "2",
        "--hidden-dropout", "0.1"]))
    assert np.isfinite(m["loss"])


def test_bert_resume_equivalence(devices8, tmp_path):
    """6 straight steps == 3 + save + resume + 3 (loss-trajectory identity,
    the reference's 100 vs 50+load+50 functional test)."""
    from pretrain_bert import parse_args, run
    ck = str(tmp_path / "bert_ck")
    m_full = run(parse_args(BERT_COMMON + ["--train-steps", "6"]))
    run(parse_args(BERT_COMMON + ["--train-steps", "3", "--save", ck,
                                  "--save-interval", "3"]))
    m_res = run(parse_args(BERT_COMMON + ["--train-steps", "6", "--save", ck,
                                          "--resume"]))
    np.testing.assert_allclose(m_res["loss"], m_full["loss"], atol=1e-6)


def test_gpt_resume_equivalence_sharded(devices8, tmp_path):
    """GPT checkpoint/resume (VERDICT r2 missing #4) under tp2 x fsdp2."""
    from pretrain_gpt import parse_args, run
    ck = str(tmp_path / "gpt_ck")
    shard = ["--tensor-model-parallel-size", "2",
             "--fsdp-parallel-size", "2"]
    m_full = run(parse_args(GPT_COMMON + shard + ["--train-steps", "6"]))
    run(parse_args(GPT_COMMON + shard + ["--train-steps", "3", "--save", ck,
                                         "--save-interval", "3"]))
    m_res = run(parse_args(GPT_COMMON + shard + [
        "--train-steps", "6", "--save", ck, "--resume",
        "--eval-interval", "6", "--eval-iters", "2"]))
    np.testing.assert_allclose(m_res["loss"], m_full["loss"], atol=1e-6)


def test_t5_sharded(devices8):
    from pretrain_t5 import parse_args, run
    m = run(parse_args([
        "--num-layers", "2", "--num-decoder-layers", "2",
        "--hidden-size", "64", "--num-heads", "4",
        "--encoder-seq-length", "32", "--decoder-seq-length", "16",
        "--vocab-size", "512", "--batch-size", "8", "--train-steps", "2",
        "--log-interval", "1", "--precision", "fp32",
        "--tensor-model-parallel-size", "2",
        "--fsdp-parallel-size", "2"]))
    assert np.isfinite(m["loss"])


def test_ict_sharded(devices8):
    from pretrain_ict import parse_args, run
    m = run(parse_args([
        "--num-layers", "2", "--hidden-size", "64", "--num-heads", "4",
        "--seq-length", "32", "--batch-size", "8", "--train-steps", "2",
        "--log-interval", "1", "--precision", "fp32",
        "--tensor-model-parallel-size", "2"]))
    assert np.isfinite(m["loss"])


def test_vision_classify_pipeline(devices8):
    """ViT classification pipelined over 2 stages (the vit backbone is the
    only one with a uniform layer stack)."""
    from pretrain_vision_classify import parse_args, run
    m = run(parse_args([
        "--num-layers", "4", "--hidden-size", "64", "--img-size", "32",
        "--patch-size", "8", "--num-classes", "10", "--batch-size", "8",
        "--train-steps", "2", "--log-interval", "1", "--precision", "fp32",
        "--pipeline-model-parallel-size", "2", "--num-microbatches", "2",
        "--tensor-model-parallel-size", "2"]))
    assert np.isfinite(m["loss"])


def test_dino_aux_state_resume(devices8, tmp_path):
    """DINO's EMA teacher + center ride the aux-state hook: resumed run
    reproduces the straight run exactly (teacher/center checkpointed)."""
    from pretrain_vision_dino import parse_args, run
    common = ["--num-layers", "2", "--hidden-size", "64", "--img-size", "32",
              "--patch-size", "8", "--out-dim", "32", "--batch-size", "4",
              "--log-interval", "1", "--precision", "fp32", "--seed", "5"]
    ck = str(tmp_path / "dino_ck")
    m_full = run(parse_args(common + ["--train-steps", "4"]))
    run(parse_args(common + ["--train-steps", "2", "--save", ck,
                             "--save-interval", "2"]))
    m_res = run(parse_args(common + ["--train-steps", "4", "--save", ck,
                                     "--resume"]))
    np.testing.assert_allclose(m_res["loss"], m_full["loss"], atol=1e-6)


def test_dino_schedules(devices8):
    """DINO teacher-temp warmup + cosine EMA momentum (megatron
    --dino-warmup-teacher-temp[-epochs], dino.py momentum_schedule): the
    step counter rides the checkpointable aux state."""
    from pretrain_vision_dino import parse_args, run
    m = run(parse_args([
        "--num-layers", "2", "--hidden-size", "64", "--img-size", "32",
        "--patch-size", "8", "--out-dim", "32", "--batch-size", "4",
        "--train-steps", "3", "--log-interval", "1", "--precision", "fp32",
        "--dino-teacher-temp", "0.07", "--dino-warmup-teacher-temp", "0.04",
        "--dino-warmup-teacher-temp-iters", "2", "--dino-momentum-cosine",
        "--dino-head-hidden-size", "32", "--dino-bottleneck-size", "16",
        "--dino-norm-last-layer", "--dino-freeze-last-layer", "2",
        "--dino-local-crops-number", "2", "--dino-local-img-size", "16"]))
    assert np.isfinite(m["loss"])


def test_dino_no_load_optim_keeps_teacher(devices8, tmp_path):
    """--no-load-optim restores the model-state aux (EMA teacher/center/
    schedule step) alongside params — only the optimizer re-inits. A
    dropped teacher would silently reset the distillation target."""
    from pretrain_vision_dino import parse_args, run
    common = ["--num-layers", "2", "--hidden-size", "64", "--img-size",
              "32", "--patch-size", "8", "--out-dim", "32", "--batch-size",
              "4", "--log-interval", "1", "--precision", "fp32",
              "--seed", "5"]
    ck = str(tmp_path / "dino_nlo")
    m0 = run(parse_args(common + ["--train-steps", "2", "--save", ck]))
    m = run(parse_args(common + ["--train-steps", "4", "--save", ck,
                                 "--resume", "--no-load-optim"]))
    assert np.isfinite(m["loss"])
    # the teacher moved with training; a reset teacher is the random-init
    # copy of the student and produces the step-1 loss again
    assert abs(m["history"][0][1] - m0["history"][0][1]) > 1e-6


def test_gpt_resume_equivalence_nu_bf16(devices8, tmp_path):
    """Resume-equivalence with the fully-bf16 adam state (adamw_lowbits,
    --nu-dtype bf16): the lowbits optimizer state must roundtrip through
    Orbax exactly, incl. the bf16 second moment."""
    from pretrain_gpt import parse_args, run
    ck = str(tmp_path / "gpt_ck_nu")
    extra = ["--nu-dtype", "bf16", "--params-dtype", "bf16"]
    m_full = run(parse_args(GPT_COMMON + extra + ["--train-steps", "6"]))
    run(parse_args(GPT_COMMON + extra + ["--train-steps", "3", "--save", ck,
                                         "--save-interval", "3"]))
    m_res = run(parse_args(GPT_COMMON + extra + [
        "--train-steps", "6", "--save", ck, "--resume"]))
    np.testing.assert_allclose(m_res["loss"], m_full["loss"], atol=1e-6)


def test_gpt_load_finetune_semantics(devices8, tmp_path):
    """megatron --load/--finetune: plain --load continues the run from a
    different root (== resume trajectory); --load --finetune restores
    params only and starts a fresh schedule at step 0."""
    from pretrain_gpt import parse_args, run
    src = str(tmp_path / "src_ck")
    m_full = run(parse_args(GPT_COMMON + ["--train-steps", "6"]))
    run(parse_args(GPT_COMMON + ["--train-steps", "3", "--save", src,
                                 "--save-interval", "3"]))

    # plain --load from src, saving elsewhere: identical to in-place resume
    dst = str(tmp_path / "dst_ck")
    m_cont = run(parse_args(GPT_COMMON + ["--train-steps", "6",
                                          "--load", src, "--save", dst]))
    np.testing.assert_allclose(m_cont["loss"], m_full["loss"], atol=1e-6)

    # --finetune: params-only init — runs steps 1..2 (fresh iteration) and
    # diverges from the continued trajectory (fresh optimizer/schedule)
    m_ft = run(parse_args(GPT_COMMON + ["--train-steps", "2",
                                        "--load", src, "--finetune"]))
    assert np.isfinite(m_ft["loss"])
    assert len(m_ft["history"]) == 2, m_ft["history"]

    # the finetune init really took the checkpoint params: step-1 loss from
    # the loaded params differs from a from-scratch step-1 loss
    m_scratch = run(parse_args(GPT_COMMON + ["--train-steps", "2"]))
    assert abs(m_ft["history"][0][1] - m_scratch["history"][0][1]) > 1e-4


def test_gpt_use_checkpoint_args(devices8, tmp_path):
    """megatron --use-checkpoint-args (checkpointing.py:441): architecture
    flags come from the checkpoint's args record; runtime flags (steps, lr,
    parallel sizes) stay from the CLI. Wrong CLI arch flags + the flag ==
    the correctly-specified continuation."""
    from pretrain_gpt import parse_args, run
    src = str(tmp_path / "uca_ck")
    arch = ["--num-layers", "2", "--hidden-size", "64", "--num-heads", "4",
            "--position-embedding", "rope", "--swiglu",
            "--normalization", "rmsnorm"]
    common = ["--seq-length", "32", "--vocab-size", "256", "--batch-size",
              "8", "--log-interval", "1", "--precision", "fp32",
              "--seed", "3"]
    m_full = run(parse_args(arch + common + ["--train-steps", "6"]))
    run(parse_args(arch + common + ["--train-steps", "3", "--save", src,
                                    "--save-interval", "3"]))
    # resume specifying NO arch flags (wrong defaults) + --use-checkpoint-args
    m_res = run(parse_args(common + ["--train-steps", "6", "--save", src,
                                     "--resume", "--use-checkpoint-args"]))
    np.testing.assert_allclose(m_res["loss"], m_full["loss"], atol=1e-6)

    # without a checkpoint to read from it refuses, like megatron's assert
    with pytest.raises(SystemExit):
        run(parse_args(common + ["--train-steps", "1",
                                 "--use-checkpoint-args"]))


def test_exit_duration_saves_and_stops(devices8, tmp_path):
    """--exit-duration-in-mins: a zero budget stops after the first step,
    having saved a checkpoint there (megatron training.py:829-851
    save-then-exit semantics)."""
    from pretrain_gpt import parse_args, run
    from megatron_clip_tpu.checkpoints import latest_checkpoint_step
    ck = str(tmp_path / "exit_ck")
    m = run(parse_args(GPT_COMMON + [
        "--train-steps", "50", "--save", ck,
        "--exit-duration-in-mins", "0"]))
    assert latest_checkpoint_step(ck) == 1
    assert len(m["history"]) == 1  # only step 1 ran


def test_no_save_optim_no_load_optim(devices8, tmp_path):
    """megatron --no-save-optim / --no-load-optim: a params-only checkpoint
    resumes (fresh optimizer, iteration kept)."""
    from pretrain_gpt import parse_args, run
    from megatron_clip_tpu.checkpoints import load_params_subtree
    ck = str(tmp_path / "nso_ck")
    run(parse_args(GPT_COMMON + ["--train-steps", "3", "--save", ck,
                                 "--no-save-optim"]))
    # the checkpoint really has no optimizer state
    import orbax.checkpoint as ocp
    import os
    raw = ocp.StandardCheckpointer().restore(
        os.path.join(ck, "iter_0000003", "state"))
    assert set(raw.keys()) == {"params"}
    m = run(parse_args(GPT_COMMON + ["--train-steps", "5", "--save", ck,
                                     "--resume", "--no-load-optim"]))
    assert m["history"][0][0] == 4  # iteration kept: first new step is 4
    assert np.isfinite(m["loss"])


def test_optimizer_flags(devices8):
    """--optimizer sgd / --sgd-momentum and the adam hyperparameter flags
    (megatron --adam-beta1/2/--adam-eps) reach the update rule."""
    from pretrain_gpt import parse_args, run
    # lr large enough that hyperparameter differences clear fp32 loss
    # resolution by step 3 (at the default 3e-4 the adam-beta trajectory
    # difference rounds to the same float)
    m_sgd = run(parse_args(GPT_COMMON + [
        "--train-steps", "3", "--lr", "0.05", "--optimizer", "sgd",
        "--sgd-momentum", "0.8"]))
    assert np.isfinite(m_sgd["loss"])
    m_adam = run(parse_args(GPT_COMMON + [
        "--train-steps", "3", "--lr", "0.05", "--adam-beta1", "0.85",
        "--adam-beta2", "0.9", "--adam-eps", "1e-6"]))
    assert np.isfinite(m_adam["loss"])
    # different hyperparameters produce a different trajectory
    m_def = run(parse_args(GPT_COMMON + ["--train-steps", "3",
                                         "--lr", "0.05"]))
    assert abs(m_adam["loss"] - m_def["loss"]) > 1e-6
    assert abs(m_sgd["loss"] - m_def["loss"]) > 1e-6


def test_skip_train_and_wd_schedule(devices8, tmp_path):
    """--skip-train evaluates a loaded checkpoint without training
    (megatron --skip-train); --weight-decay-incr-style ramps the decay."""
    from pretrain_gpt import parse_args, run
    ck = str(tmp_path / "st_ck")
    run(parse_args(GPT_COMMON + ["--train-steps", "2", "--save", ck]))
    m = run(parse_args(GPT_COMMON + [
        "--train-steps", "2", "--load", ck, "--skip-train",
        "--eval-iters", "2"]))
    assert m["history"] == [] and np.isfinite(m["val_loss"])

    m_wd = run(parse_args(GPT_COMMON + [
        "--train-steps", "3", "--weight-decay-incr-style", "linear",
        "--start-weight-decay", "0.0", "--end-weight-decay", "0.3"]))
    assert np.isfinite(m_wd["loss"])


def test_lr_warmup_fraction(devices8):
    """--lr-warmup-fraction 0.5 over 4 steps == --warmup 2 exactly."""
    from pretrain_gpt import parse_args, run
    m_frac = run(parse_args(GPT_COMMON + [
        "--train-steps", "4", "--lr-warmup-fraction", "0.5"]))
    m_steps = run(parse_args(GPT_COMMON + [
        "--train-steps", "4", "--warmup", "2"]))
    np.testing.assert_allclose(m_frac["loss"], m_steps["loss"], atol=1e-7)


def test_tensorboard_dir(devices8, tmp_path):
    """--tensorboard-dir writes train/val scalars (megatron training_log)."""
    import os
    from pretrain_gpt import parse_args, run
    tb = str(tmp_path / "tb")
    run(parse_args(GPT_COMMON + [
        "--train-steps", "2", "--eval-interval", "2", "--eval-iters", "1",
        "--tensorboard-dir", tb]))
    assert any(f.startswith("events") for f in os.listdir(tb))


def test_vocab_padding_and_bert_no_nsp(devices8):
    """--make-vocab-size-divisible-by pads the embedding/vocab dim;
    --bert-no-binary-head drops the NSP head (megatron flags)."""
    from pretrain_gpt import parse_args as ga, run as gr
    m = gr(ga(["--num-layers", "2", "--hidden-size", "64", "--num-heads",
               "4", "--seq-length", "32", "--vocab-size", "250",
               "--make-vocab-size-divisible-by", "128", "--batch-size", "8",
               "--train-steps", "2", "--log-interval", "1",
               "--precision", "fp32"]))
    assert np.isfinite(m["loss"])
    from pretrain_bert import parse_args as ba, run as br
    m2 = br(ba(BERT_COMMON + ["--train-steps", "2",
                              "--bert-no-binary-head"]))
    assert np.isfinite(m2["loss"])


def test_gpt_three_axis_parity(devices8):
    """tp2 x pp2 x cp2 composed in one program == pure-dp run on the same
    synthetic stream (each axis has its own parity test; this pins the
    composition — the combo megatron's scheduler serves via TE/CP groups)."""
    from pretrain_gpt import parse_args, run
    common = ["--num-layers", "4", "--hidden-size", "64", "--num-heads", "4",
              "--seq-length", "64", "--vocab-size", "256", "--batch-size",
              "8", "--train-steps", "2", "--warmup", "1", "--precision",
              "fp32", "--log-interval", "1", "--position-embedding", "rope",
              "--seed", "11"]
    m_combo = run(parse_args(common + [
        "--tensor-model-parallel-size", "2",
        "--pipeline-model-parallel-size", "2", "--num-microbatches", "2",
        "--context-parallel-size", "2"]))
    m_dp = run(parse_args(common))
    np.testing.assert_allclose(m_combo["loss"], m_dp["loss"], atol=2e-3)


def test_gpt_three_axis_with_moe_and_dropout(devices8):
    """The same 3-axis mesh also composes with MoE + hidden dropout (attn
    dropout under CP is a documented clean rejection)."""
    from pretrain_gpt import parse_args, run
    m = run(parse_args([
        "--num-layers", "4", "--hidden-size", "64", "--num-heads", "4",
        "--seq-length", "64", "--vocab-size", "256", "--batch-size", "8",
        "--train-steps", "2", "--warmup", "1", "--precision", "fp32",
        "--log-interval", "1", "--position-embedding", "rope",
        "--tensor-model-parallel-size", "2",
        "--pipeline-model-parallel-size", "2", "--num-microbatches", "2",
        "--context-parallel-size", "2", "--hidden-dropout", "0.1",
        "--num-experts", "2"]))
    assert np.isfinite(m["loss"])


def test_megatron_flag_aliases():
    """Megatron spellings parse as aliases of the native flags
    (arguments.py: --global-batch-size/--train-iters/--lr-warmup-iters/
    --clip-grad/--num-attention-heads/--num-query-groups/
    --ffn-hidden-size), and --micro-batch-size derives the pipeline
    microbatch count like microbatches.py."""
    import pretrain_gpt
    from megatron_clip_tpu.training.workload import runtime_cfg_from_args
    a = pretrain_gpt.parse_args([
        "--num-layers", "2", "--hidden-size", "64",
        "--num-attention-heads", "4", "--seq-length", "32",
        "--vocab-size", "256", "--global-batch-size", "8",
        "--train-iters", "3", "--lr-warmup-iters", "1",
        "--clip-grad", "0.5", "--ffn-hidden-size", "192",
        "--num-query-groups", "2", "--group-query-attention"])
    assert (a.num_heads, a.batch_size, a.train_steps) == (4, 8, 3)
    assert (a.warmup, a.grad_clip_norm, a.kv_heads) == (1, 0.5, 2)
    assert a.ffn_hidden_size == 192
    # micro-batch-size is informational without pp, drives microbatches
    # under pp>1 (global/micro)
    rc = runtime_cfg_from_args(pretrain_gpt.parse_args(
        ["--global-batch-size", "8", "--micro-batch-size", "4"]), "gpt")
    assert rc.num_microbatches == 1
    rc = runtime_cfg_from_args(pretrain_gpt.parse_args(
        ["--global-batch-size", "8", "--micro-batch-size", "2",
         "--pipeline-model-parallel-size", "2"]), "gpt")
    assert rc.num_microbatches == 4

    import pretrain_t5
    a = pretrain_t5.parse_args([
        "--encoder-num-layers", "3", "--decoder-num-layers", "2",
        "--num-attention-heads", "4"])
    assert (a.num_layers, a.num_decoder_layers, a.num_heads) == (3, 2, 4)


def test_gpt_vpp_resume_equivalence(devices8, tmp_path):
    """Interleaved pipeline (vpp2): the in-memory layers live in
    vpp_arrange physical order but checkpoints stay logical — 3+save+
    resume+3 must equal 6 straight steps, and the checkpoint must load
    into a pp1 run (layout independence)."""
    from pretrain_gpt import parse_args, run
    ck = str(tmp_path / "gpt_vpp_ck")
    vpp = ["--num-layers", "8",
           "--pipeline-model-parallel-size", "2",
           "--virtual-pipeline-parallel-size", "2",
           "--num-microbatches", "4",
           "--fsdp-parallel-size", "2"]
    m_full = run(parse_args(GPT_COMMON + vpp + ["--train-steps", "6"]))
    run(parse_args(GPT_COMMON + vpp + ["--train-steps", "3", "--save", ck,
                                       "--save-interval", "3"]))
    # the step-3 checkpoint loads into a DIFFERENT layout (pp1): logical
    # layer order in the checkpoint is what makes this legal. Run this
    # BEFORE the resume run (which re-saves the root at step 6).
    m_pp1 = run(parse_args(
        GPT_COMMON + ["--num-layers", "8", "--fsdp-parallel-size", "2",
                      "--train-steps", "4", "--load", ck, "--no-load-optim"]))
    m_res = run(parse_args(GPT_COMMON + vpp + [
        "--train-steps", "6", "--save", ck, "--resume"]))
    np.testing.assert_allclose(m_res["loss"], m_full["loss"], atol=1e-5)
    # both runs' first logged step after the checkpoint is step 4, computed
    # from identical step-3 params (params-only load) -> identical loss
    np.testing.assert_allclose(m_pp1["history"][0][1], m_res["history"][0][1],
                               atol=1e-4)
