"""Ahead-of-time model export via jax.export (serialized StableHLO).

The reference's deployment-artifact path is TorchScript (`--torchscript`,
open_CLIP/src/training/main.py / params.py). The JAX/TPU equivalent is
`jax.export`: trace + lower the jitted function once, serialize the
StableHLO module, and reload/execute it later without the model code —
including on a different host, with shape/dtype checking at call time.
"""
import jax
import jax.numpy as jnp
from jax import export as jax_export


def export_clip(model, params, *, batch_size: int = 1):
    """Export encode_image / encode_text / forward as serialized StableHLO.

    Params are baked into the artifact as constants (TorchScript-like
    self-contained deployment blob). Returns {name: bytes}.
    """
    h = w = model.image_size
    s = model.context_length
    images = jnp.zeros((batch_size, h, w, 3), jnp.float32)
    texts = jnp.zeros((batch_size, s), jnp.int32)

    def enc_i(images):
        return model.encode_image(params, images)

    def enc_t(texts):
        return model.encode_text(params, texts)

    def fwd(images, texts):
        out = model(params, images, texts)
        return out["image_features"], out["text_features"], out["logit_scale"]

    return {
        "encode_image": jax_export.export(jax.jit(enc_i))(images).serialize(),
        "encode_text": jax_export.export(jax.jit(enc_t))(texts).serialize(),
        "forward": jax_export.export(jax.jit(fwd))(images, texts).serialize(),
    }


def save_exported(artifacts: dict, path: str) -> None:
    """Write a directory of .stablehlo blobs + manifest."""
    import json
    import os
    os.makedirs(path, exist_ok=True)
    for name, blob in artifacts.items():
        with open(os.path.join(path, name + ".stablehlo"), "wb") as f:
            f.write(blob)
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump({"functions": sorted(artifacts)}, f)


def load_exported(path: str) -> dict:
    """Reload exported functions: {name: callable}."""
    import json
    import os
    with open(os.path.join(path, "manifest.json")) as f:
        names = json.load(f)["functions"]
    fns = {}
    for name in names:
        with open(os.path.join(path, name + ".stablehlo"), "rb") as f:
            exp = jax_export.deserialize(f.read())
        fns[name] = exp.call
    return fns
