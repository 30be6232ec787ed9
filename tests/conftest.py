"""Test configuration: force CPU backend with 8 virtual devices so every
mesh/parallelism test runs without TPU hardware (the strategy SURVEY.md §4
recommends in place of the reference's torchrun multi-GPU unit tests)."""
import os

# must happen before jax is imported anywhere. MCT_TPU_TESTS=1 keeps the
# real TPU backend for the hardware-only tests (test_flash_dropout_tpu.py).
_keep_tpu = os.environ.get("MCT_TPU_TESTS") == "1"
if not _keep_tpu:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = \
            (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
# the environment's sitecustomize force-registers a TPU plugin regardless of
# JAX_PLATFORMS; override at the config level too.
if not _keep_tpu:
    jax.config.update("jax_platforms", "cpu")
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices8():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs[:8]


# ---------------------------------------------------------------------------
# quick/slow tiers: the heavyweight parity tests (multi-minute compiles on a
# 1-core CPU host) are skipped by default so the default `pytest tests/`
# finishes quickly; run everything with --runslow (CI / pre-release).
# Measured >=30s each on the reference 1-core box.

SLOW_TESTS = (
    "test_interleaved_gradients_match",
    "test_sharded_step_matches_single_device",
    "test_resume_equivalence",
    "test_accum_freq_matches_full_batch",
    "test_pipeline_gradients_match",
    "test_sharded_clip_loss_matches_global",
    "test_branch_step_matches_joint_step",
    "test_train_mode_stats_and_grads",
    "test_siglip_cli_training",
    "test_gpt_trains_with_dropout",
    "test_coca_loss_trains",
    "test_branch_parallel_with_pipeline",
    "test_sequence_parallel_matches",
    "test_rn_clip_factory_end_to_end",
    "test_resnet.py::test_forward_shapes",
    "test_entry_points_smoke",
    "test_greedy_matches_unrolled_argmax",
    "test_grad_flows_through_both_towers",
    "test_pipeline_matches_sequential",
    "test_grad_blocked_gather_only_local_grads",
    "test_golden_loss",
    "test_webdataset_training",
    "test_pipeline_with_additive_bias_matches_sequential",
    "test_pipeline_memory_flat_in_microbatches",
    "test_interleaved_matches_sequential",
    "test_val_and_zeroshot_eval",
    "test_synthetic_branch_parallel",
    "test_gpt_pipeline_cli",
    "test_ict_biencoder_learns_retrieval",
    "test_glue_learns_keyword_task",
    "test_hidden_states_match_transformers",
    "test_load_hf_text_tower_roundtrip",
    "test_load_llama_hf_roundtrip",
    "test_import_cli",
    # round-2 additions: the 20-35s single-test heavyweights (full coverage
    # still runs under --runslow; a cheaper sibling of each stays quick)
    "test_eval_uses_running_stats",        # rn50_factory_geometry stays
    "test_forward_shape_and_grads",        # convnext; factory e2e stays
    "test_retro_forward_and_grads",        # retro_learns stays
    "test_mit_forward_and_grads",
    "test_swin_forward_and_grads",
    "test_dropout_under_remat_matches_no_remat",
    "test_csv_training",                   # synthetic_one_epoch stays
    "test_remote_sync_and_wandb_flags_run_training",
    "test_esvit_trains_one_step",
    "test_lock_image_freezes_visual_only",  # lock_text sibling stays
    "test_distill_loss_larger_than_plain",  # distill_step sibling stays
    "test_gpt_cp_training_matches_serial",  # cp fwd/bwd parity stays
    "test_siglip_ring_matches_global",      # siglip global-form test stays
    "test_weight_decay_blocked_on_frozen",  # covered by lock tests
    "test_finetune_improves_in_batch_accuracy",  # orqa eval e2e stays
    # round-3 additions
    "test_bhsd_projection_path_matches_packed",  # s2048 interpret-mode grads
    # round-4 re-tiering: everything measured >=13s on the idle 1-core box
    # (full default tier had crept to 58 min; now ~14 min — VERDICT r3 #5).
    # Representatives kept quick: test_synthetic_one_epoch (app e2e),
    # test_interleaved_prearranged_matches_logical (vpp layout),
    # test_branch_eval_params_runs_eval (branch runner), plus every file's
    # sub-13s tests. Full coverage runs under --runslow.
    "test_bert_resume_equivalence",
    "test_bert_sharded_with_pipeline_and_dropout",
    "test_branch_accum_freq_matches_full_batch",
    "test_branch_vpp_prearranged_matches_joint",
    "test_branch_vpp_prearranged_no_weight_permute",
    "test_coca_accum_freq_matches_full_batch",
    "test_coca_generate_sampling_modes",
    "test_coca_through_training_app",
    "test_dcn_dp_train_step_matches_flat_dp",
    "test_dino_aux_state_resume",
    "test_dino_knn_monitor_e2e",
    "test_dino_loss_and_ema",
    "test_dino_no_load_optim_keeps_teacher",
    "test_dino_schedules",
    "test_distill_composes_with_accum_freq",
    "test_distill_step_runs_and_teacher_fixed",
    "test_dropout_changes_loss_and_grads_flow",
    "test_exit_interval_ends_run_not_epoch",
    "test_factory_end_to_end_tiny_convnext",
    "test_force_image_size_model_and_transforms",
    "test_gpt_cp_with_pipeline",
    "test_gpt_load_finetune_semantics",
    "test_gpt_resume_equivalence_nu_bf16",
    "test_gpt_resume_equivalence_sharded",
    "test_gpt_three_axis_parity",
    "test_gpt_three_axis_with_moe_and_dropout",
    "test_gpt_use_checkpoint_args",
    "test_gpt_vpp_resume_equivalence",
    "test_gpt_zigzag_cp_training_matches_serial",
    "test_grad_parity",                     # loss_parity siblings stay
    "test_inpaint_reconstruction_learns",   # masked-loss sibling stays
    "test_interleaved_dropout_matches_microbatched",
    "test_interleaved_moe_aux_matches_microbatched",
    "test_interleaved_prearranged_gradients_match",
    "test_joint_clip_pipeline_matches_single_device",
    "test_joint_clip_vpp_prearranged_and_ckpt_layout",
    "test_lock_text_freezes_text_only",     # unlocked_groups sibling stays
    "test_lr_warmup_fraction",
    "test_mlp_proj_head",
    "test_no_save_optim_no_load_optim",
    "test_optimizer_flags",
    "test_patch_dropout_active_in_train_step",
    "test_pipeline_bf16_compiles_and_matches",
    "test_pipeline_dropout_gradients_match",
    "test_pipeline_dropout_matches_microbatched",
    "test_pipeline_moe_aux_matches_microbatched",
    "test_pipeline_per_row_position_ids",
    "test_pretrain_bert_on_sentence_corpus",
    "test_pretrained_init_and_image_only",
    "test_relpos_tower_pipelines",
    "test_relpos_vit_tower",                # relpos_zoo_model_builds stays
    "test_resize_pos_embed_on_load",
    "test_resume_explicit_path",
    "test_retro_learns_retrieval_task",
    "test_rn50_factory_geometry",
    "test_save_most_recent_and_delete_previous",
    "test_skip_train_and_wd_schedule",
    "test_steps_per_epoch_bounds_epochs",
    "test_swin_and_gap_vit_towers_forward",
    "test_t5_e2e_on_generated_corpus",
    "test_t5_encoder_decoder",
    "test_t5_encoder_matches_transformers",
    "test_t5_sharded",
    "test_train_step_reduces_coca_loss",
    "test_vision_segment_cityscapes",       # segment_learns sibling... both
    "test_vision_segment_learns",           # heavy; setr variant stays
    "test_vocab_padding_and_bert_no_nsp",
    # 7-13s band with cheaper siblings covering the same feature
    "test_ragged_prompts_match_unpadded",   # pp-serving ragged test stays
    "test_clip_with_t5_text_tower",         # factory_hf_text_clip stays
    "test_lambada_accuracy_counts_model_argmax",  # wikitext eval stays
    "test_generate_runs",                   # coca generate beam stays
    "test_generation_under_tp_mesh",        # pp-serving mesh decode stays
    "test_capacity_one_expert_collapse",    # moe swiglu/switch tests stay
    "test_moe_transformer_runs_and_trains",
    "test_tensorboard_dir",                 # TB covered by the CLIP app
    "test_relpos_with_patch_dropout",       # relpos_zoo_model_builds stays
    # round-5 additions (measured on the idle 1-core box): the multi-minute
    # pipelined-parity compiles. Quick coverage of the same features stays:
    # full-size goldens (coca arch + converters), pp-beam token-exactness,
    # ring-attention-bias fwd/bwd, async-checkpoint ordering, draft decode.
    "test_coca_pipeline_matches_unpipelined",     # 210s
    "test_relpos_patch_dropout_pipelines",        # 101s
    "test_pipeline_bias_with_cp_matches_serial",  # 93s
    "test_branch_local_loss_join_matches_global",  # 58s; every default-tier
    # branch test now exercises the local_loss join (it is the default)
)


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="also run the slow (multi-minute) parity tests")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow tier: pass --runslow to include")
    for item in items:
        name = item.name.split("[")[0]
        if name in SLOW_TESTS or any(
                "::" in s and item.nodeid.split("[")[0].endswith(s)
                for s in SLOW_TESTS):
            item.add_marker(skip)
