"""Prithvi geospatial MAE encoder (reference
prithvi_geospatial_mae.py role — the reference wraps the external
terratorch package; here the ViT-MAE encoder is in-tree). Goldened
against a composed torch replica of the MAE encoder math."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")

IMG, PS, BANDS, T, E, DEPTH, HEADS = 16, 4, 6, 2, 32, 2, 2


def _build(tmp_path):
    from safetensors.numpy import save_file
    rng = np.random.default_rng(51)

    def r(*shape, s=0.05):
        return (rng.standard_normal(shape) * s).astype(np.float32)
    out = {}
    out["encoder.patch_embed.proj.weight"] = r(E, BANDS, 1, PS, PS)
    out["encoder.patch_embed.proj.bias"] = r(E)
    out["encoder.cls_token"] = r(1, 1, E)
    for li in range(DEPTH):
        o = f"encoder.blocks.{li}."
        out[o + "norm1.weight"] = np.ones(E, np.float32)
        out[o + "norm1.bias"] = np.zeros(E, np.float32)
        out[o + "norm2.weight"] = np.ones(E, np.float32)
        out[o + "norm2.bias"] = np.zeros(E, np.float32)
        out[o + "attn.qkv.weight"] = r(3 * E, E)
        out[o + "attn.qkv.bias"] = r(3 * E)
        out[o + "attn.proj.weight"] = r(E, E)
        out[o + "attn.proj.bias"] = r(E)
        out[o + "mlp.fc1.weight"] = r(2 * E, E)
        out[o + "mlp.fc1.bias"] = r(2 * E)
        out[o + "mlp.fc2.weight"] = r(E, 2 * E)
        out[o + "mlp.fc2.bias"] = r(E)
    out["encoder.norm.weight"] = np.ones(E, np.float32)
    out["encoder.norm.bias"] = np.zeros(E, np.float32)
    dd = tmp_path / "prithvi"
    dd.mkdir()
    save_file(out, str(dd / "model.safetensors"))
    json.dump({"architectures": ["PrithviGeoSpatialMAE"],
               "model_type": "prithvi",
               "img_size": IMG, "patch_size": PS, "num_channels": BANDS,
               "num_frames": T, "t_patch_size": 1, "embed_dim": E,
               "depth": DEPTH, "num_heads": HEADS, "mlp_ratio": 2.0},
              open(dd / "config.json", "w"))
    return dd, out


def _torch_encoder(out, px, pos):
    ln = torch.nn.functional.layer_norm
    x = torch.tensor(px)[None]          # [1, C, T, H, W]
    w = torch.tensor(out["encoder.patch_embed.proj.weight"])
    b = torch.tensor(out["encoder.patch_embed.proj.bias"])
    x = torch.nn.functional.conv3d(x, w, b, stride=(1, PS, PS))
    x = x.flatten(2).transpose(1, 2)[0]  # [t*h*w, E]
    x = x + torch.tensor(pos)
    cls = torch.tensor(out["encoder.cls_token"]).reshape(1, E)
    x = torch.cat([cls, x], dim=0)
    hd = E // HEADS
    for li in range(DEPTH):
        o = f"encoder.blocks.{li}."
        t = lambda k: torch.tensor(out[o + k])  # noqa: E731
        xn = ln(x, (E,), t("norm1.weight"), t("norm1.bias"), eps=1e-6)
        qkv = xn @ t("attn.qkv.weight").T + t("attn.qkv.bias")
        n = qkv.shape[0]
        qkv = qkv.reshape(n, 3, HEADS, hd).permute(1, 2, 0, 3)
        q, k, v = qkv[0], qkv[1], qkv[2]
        a = torch.nn.functional.scaled_dot_product_attention(q, k, v)
        a = a.transpose(0, 1).reshape(n, E)
        x = x + a @ t("attn.proj.weight").T + t("attn.proj.bias")
        xn = ln(x, (E,), t("norm2.weight"), t("norm2.bias"), eps=1e-6)
        h = torch.nn.functional.gelu(
            xn @ t("mlp.fc1.weight").T + t("mlp.fc1.bias"))
        x = x + h @ t("mlp.fc2.weight").T + t("mlp.fc2.bias")
    return ln(x, (E,), torch.tensor(out["encoder.norm.weight"]),
              torch.tensor(out["encoder.norm.bias"]), eps=1e-6)


def test_prithvi_encoder_golden(tmp_path):
    import jax

    from vllm_pq_tpu.config import EngineConfig
    from vllm_pq_tpu.model_loader.loader import load_model_params
    from vllm_pq_tpu.models.prithvi import sincos_3d
    from vllm_pq_tpu.models.registry import build_model
    from vllm_pq_tpu.quantization.methods import UnquantizedLinearMethod
    d, out = _build(tmp_path)
    cfg = EngineConfig()
    cfg.model.model = str(d)
    cfg.model.dtype = "float32"
    from jax.sharding import Mesh
    mesh = Mesh(np.array(jax.devices()[:1]), ("tp",))
    lm = UnquantizedLinearMethod()
    model, _ = build_model(cfg, lm)
    assert model.__class__.__name__ == "PrithviModel"
    params = load_model_params(model, mesh, cfg, lm)
    rng = np.random.default_rng(52)
    px = rng.standard_normal((BANDS, T, IMG, IMG)).astype(np.float32)
    gt, gside = T, IMG // PS
    pos = sincos_3d(E, gt, gside, gside)
    with torch.no_grad():
        want = _torch_encoder(out, px, pos).numpy()
    ours = np.asarray(jax.device_get(model.encode_pixels(
        jax.device_get(params), px)))
    np.testing.assert_allclose(ours, want, rtol=2e-4, atol=2e-4)
