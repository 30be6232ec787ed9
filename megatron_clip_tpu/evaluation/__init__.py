from megatron_clip_tpu.evaluation.zero_shot import (  # noqa: F401
    build_zero_shot_classifier, zero_shot_classification, zero_shot_eval,
    SIMPLE_IMAGENET_TEMPLATES)
from megatron_clip_tpu.evaluation.retrieval import (  # noqa: F401
    contrastive_eval_metrics, recall_at_k, recall_at_k_device)
