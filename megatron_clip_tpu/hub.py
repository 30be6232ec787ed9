"""Export / publish checkpoints in the HuggingFace-hub open_clip layout.

Re-implements open_CLIP/src/open_clip/push_to_hf_hub.py: `save_for_hf`
writes the artifact directory (open_clip_config.json + torch weights +
model card), `push_to_hf_hub` uploads it with huggingface_hub when that is
installed and the network allows — the save step is fully offline and is
what round-trips with real open_clip (`open_clip_pytorch_model.bin` is a
torch state dict convertible back via checkpoints/torch_interop.py).
"""
import dataclasses
import json
import os
from pathlib import Path
from typing import Optional

HF_WEIGHTS_NAME = "open_clip_pytorch_model.bin"
HF_CONFIG_NAME = "open_clip_config.json"

OPENAI_DATASET_MEAN = (0.48145466, 0.4578275, 0.40821073)
OPENAI_DATASET_STD = (0.26862954, 0.26130258, 0.27577711)


def _model_cfg_dict(cfg) -> dict:
    """CLIPCfg -> the open_clip config-JSON model_cfg schema."""
    # identity checks, not `in (None, False)`: 0/0.0 == False in Python, and
    # an explicit zero (patch_dropout=0, drop_path=0.0) must survive export
    vision = {k: v for k, v in dataclasses.asdict(cfg.vision).items()
              if v is not None and v is not False}
    text = {k: v for k, v in dataclasses.asdict(cfg.text).items()
            if v is not None and v is not False}
    if cfg.resnet_layers is not None:
        vision["layers"] = list(cfg.resnet_layers)
        vision["width"] = cfg.resnet_width
    if cfg.convnext is not None:
        vision = {"timm_model_name": cfg.convnext,
                  "timm_proj": cfg.convnext_proj,
                  "timm_drop_path": cfg.convnext_drop_path,
                  "image_size": cfg.vision.image_size}
    out = {"embed_dim": cfg.embed_dim, "vision_cfg": vision,
           "text_cfg": text}
    if cfg.quick_gelu:
        out["quick_gelu"] = True
    if cfg.init_logit_bias is not None:
        out["init_logit_bias"] = cfg.init_logit_bias
    return out


def save_for_hf(model, params, save_directory: str, *,
                model_card: Optional[dict] = None,
                safe_serialization: bool = False) -> Path:
    """Write the HF-hub artifact dir for a CLIP model
    (push_to_hf_hub.py save_for_hf): config JSON, torch weights, README."""
    save_directory = Path(save_directory)
    save_directory.mkdir(parents=True, exist_ok=True)

    cfg = model.cfg
    config = {
        "model_cfg": _model_cfg_dict(cfg),
        "preprocess_cfg": {
            "mean": list(OPENAI_DATASET_MEAN),
            "std": list(OPENAI_DATASET_STD),
            "size": cfg.vision.image_size,
        },
    }
    with open(save_directory / HF_CONFIG_NAME, "w") as f:
        json.dump(config, f, indent=2)

    from megatron_clip_tpu.checkpoints.torch_interop import (
        openclip_state_dict_from_params)
    sd = openclip_state_dict_from_params(params, cfg)
    try:
        import torch
        tensors = {k: torch.from_numpy(v.copy()) for k, v in sd.items()}
        if safe_serialization:
            from safetensors.torch import save_file
            save_file(tensors, save_directory / "open_clip_model.safetensors")
        else:
            torch.save(tensors, save_directory / HF_WEIGHTS_NAME)
    except ImportError:
        # torch-free environment: numpy fallback (loadable by
        # checkpoints/torch_interop.load_openclip_checkpoint)
        import numpy as np
        np.savez(save_directory / "open_clip_model.npz", **sd)

    card = model_card or {}
    name = card.get("name", model.name or "clip")
    readme = [
        "---",
        "tags:",
        "- clip",
        "library_name: open_clip",
        "pipeline_tag: zero-shot-image-classification",
        f"license: {card.get('license', 'mit')}",
        "---",
        f"# Model card for {name}",
        "",
        card.get("description",
                 "CLIP checkpoint exported by megatron_clip_tpu "
                 "in the open_clip hub layout."),
    ]
    (save_directory / "README.md").write_text("\n".join(readme))
    return save_directory


def push_to_hf_hub(model, params, repo_id: str, *, commit_message: str =
                   "Add model", token: Optional[str] = None,
                   private: bool = False, model_card: Optional[dict] = None,
                   safe_serialization: bool = False):
    """Upload the artifact dir with huggingface_hub (requires network +
    huggingface_hub; everything before the upload is offline)."""
    try:
        from huggingface_hub import HfApi
    except ImportError as e:
        raise RuntimeError(
            "push_to_hf_hub requires the huggingface_hub package; "
            "use save_for_hf(...) to produce the artifact dir offline"
        ) from e
    import tempfile
    api = HfApi(token=token)
    api.create_repo(repo_id, private=private, exist_ok=True)
    with tempfile.TemporaryDirectory() as tmp:
        save_for_hf(model, params, tmp, model_card=model_card,
                    safe_serialization=safe_serialization)
        return api.upload_folder(repo_id=repo_id, folder_path=tmp,
                                 commit_message=commit_message)
