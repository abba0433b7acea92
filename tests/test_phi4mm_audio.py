"""Phi-4-MM audio conformer encoder vs a composed torch replica of the
reference math (phi4mm_audio.py / phi4mm_utils.py): MeanVarianceNorm,
NeMo dw-striding subsampling, half-step GLU feed-forwards, MHA with a
T5 relative logit bias (skip-bucketing, asymmetric), the causal
GLU-pointwise + depthwise-separable conv module, chunked streaming
masks, and >max_seq_len unfolding."""

import json
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")

MELS, D, HEADS, FFN, BLOCKS = 8, 16, 2, 24, 2
KS, EXT, EXTK, DSOUT = 3, 16, 2, 16
TRED, CH = 4, 8                 # nemo factor / channels
T5MD = 8
CHUNK, LEFT = 4, 1
MAXSEQ = 6
TH = 20                          # projection width

CFG = dict(input_size=MELS, attention_dim=D, attention_heads=HEADS,
           linear_units=FFN, num_blocks=BLOCKS, kernel_size=KS,
           ext_pw_out_channel=EXT, ext_pw_kernel_size=EXTK,
           depthwise_seperable_out_channel=DSOUT,
           depthwise_multiplier=1, causal=True, batch_norm=False,
           activation="swish", conv_activation="swish",
           conv_glu_type="swish", bias_in_glu=True,
           time_reduction=TRED, chunk_size=CHUNK, left_chunk=LEFT,
           nemo_conv_settings={"conv_channels": CH},
           relative_attention_bias_args={
               "type": "t5", "t5_bias_max_distance": T5MD,
               "t5_bias_symmetric": False, "t5_skip_bucketing": True},
           encoder_embedding_config={"input_size": MELS})


def _mk_params(rng):
    """Numpy weights in OUR template layout + the torch-layout dict."""
    from vllm_pq_tpu.models.phi4mm_audio import (ConformerConfig,
                                                 Phi4MMAudioEncoder)
    cfg = ConformerConfig.from_hf(dict(CFG, max_seq_len=MAXSEQ))
    cfg.max_seq_len = MAXSEQ
    enc = Phi4MMAudioEncoder(cfg, TH)
    shapes = enc.param_shapes("float32")

    def fill(node):
        if isinstance(node, dict):
            return {k: fill(v) for k, v in node.items()}
        if isinstance(node, list):
            return [fill(v) for v in node]
        shape, _ = node
        return (rng.standard_normal(shape) * 0.1).astype(np.float32)
    params = fill(shapes)
    params["mean"]["weight"] = \
        (rng.standard_normal(MELS) * 0.3).astype(np.float32)
    params["invstd"]["weight"] = \
        (1.0 + rng.random(MELS)).astype(np.float32)
    return enc, cfg, params


def _torch_forward(cfg, p, mel):
    """torch replica (reference forward conventions)."""
    sw = lambda t: t * torch.sigmoid(t)  # noqa: E731
    ln = torch.nn.functional.layer_norm
    x = (torch.tensor(mel) - torch.tensor(p["mean"]["weight"])) \
        * torch.tensor(p["invstd"]["weight"])
    x = x[None]

    # nemo dw_striding: conv2d s2 + [dw s2, pw] with ReLU
    h = x[:, None]                                  # [1, 1, T, F]
    conv_ws = p["nemo"]["layers"]

    def c2d(d, h, stride, groups=1, pad=1):
        w = torch.tensor(d["weight"]).permute(3, 2, 0, 1)
        return torch.nn.functional.conv2d(
            h, w, torch.tensor(d["bias"]), stride=stride, padding=pad,
            groups=groups)
    h = torch.relu(c2d(conv_ws[0], h, 2))
    h = c2d(conv_ws[1], h, 2, groups=CH)
    h = torch.relu(c2d(conv_ws[2], h, 1, pad=0))
    b, cc, t, f = h.shape
    h = h.permute(0, 2, 1, 3).reshape(b, t, cc * f)
    x = h @ torch.tensor(p["nemo"]["out"]["weight"]) \
        + torch.tensor(p["nemo"]["out"]["bias"])

    t = x.shape[1]
    # unfold
    pad_t = (MAXSEQ - t % MAXSEQ) % MAXSEQ if t > MAXSEQ else 0
    if t > MAXSEQ:
        x = torch.nn.functional.pad(x, (0, 0, 0, pad_t))
        x = x.reshape(-1, MAXSEQ, x.shape[-1])
    tc = x.shape[1]

    # t5 bias (skip bucketing, asymmetric)
    rel = (torch.arange(tc)[None, :] - torch.arange(tc)[:, None]) \
        .clamp(-T5MD, T5MD - 1)
    bias_tab = torch.tensor(p["t5_bias"]["weight"])   # [2*md, H]
    bias = bias_tab[rel + T5MD].permute(2, 0, 1)[None]

    # streaming mask
    starts = np.arange(0, tc, CHUNK)
    start_pad = np.concatenate([[0], starts])
    end_pad = np.concatenate([starts, [tc]])
    seq = np.arange(tc)
    idx = ((seq[:, None] < end_pad[None])
           & (seq[:, None] >= start_pad[None])).argmax(1)
    bl = start_pad[np.maximum(idx - LEFT, 0)]
    br = end_pad[np.minimum(idx, len(starts))]
    smask = torch.tensor((seq[None] >= bl[:, None])
                         & (seq[None] < br[:, None]))

    def ff(fp, u):
        h = ln(u, (D,), torch.tensor(fp["ln"]["weight"]),
               torch.tensor(fp["ln"]["bias"]))
        g = h @ torch.tensor(fp["glu"]["weight"]) \
            + torch.tensor(fp["glu"]["bias"])
        a, bgate = g[..., :FFN], g[..., FFN:]
        h = a * sw(bgate)
        return h @ torch.tensor(fp["out"]["weight"]) \
            + torch.tensor(fp["out"]["bias"])

    def attn(ap, u):
        bq, tq, _ = u.shape
        dk = D // HEADS

        def lin(d, v):
            return v @ torch.tensor(d["weight"]) \
                + torch.tensor(d["bias"])
        q = lin(ap["q"], u).view(bq, tq, HEADS, dk) / math.sqrt(dk)
        k = lin(ap["k"], u).view(bq, tq, HEADS, dk)
        v = lin(ap["v"], u).view(bq, tq, HEADS, dk)
        sc = torch.einsum("bqhd,bkhd->bhqk", q, k) + bias
        sc = sc.masked_fill(~smask[None, None], float("-inf"))
        pr = torch.softmax(sc, dim=-1)
        ctx = torch.einsum("bhqk,bkhd->bqhd", pr, v) \
            .reshape(bq, tq, D)
        return lin(ap["out"], ctx)

    def conv1d(d, u, pad, groups=1):
        w = torch.tensor(d["weight"]).permute(2, 1, 0)
        return torch.nn.functional.conv1d(
            u, w, torch.tensor(d["bias"]), padding=pad, groups=groups)

    def convm(cp, u):
        h = ln(u, (D,), torch.tensor(cp["ln"]["weight"]),
               torch.tensor(cp["ln"]["bias"]))
        hc = h.transpose(1, 2)
        g = conv1d(cp["glu_w"], hc, EXTK - 1).transpose(1, 2)
        a = g[..., :EXT] + torch.tensor(cp["glu_b1"]["weight"])
        bb = g[..., EXT:] + torch.tensor(cp["glu_b2"]["weight"])
        g = a * sw(bb)
        g = g[:, :-(EXTK - 1)]
        hc = g.transpose(1, 2)
        hc = conv1d(cp["dw"], hc, KS - 1, groups=D)
        hc = conv1d(cp["pw"], hc, 0)
        hc = hc[:, :, :-(KS - 1)]
        hc = sw(hc)
        hc = conv1d(cp["ext_pw"], hc, EXTK - 1)
        hc = hc[:, :, :-(EXTK - 1)]
        return hc.transpose(1, 2)

    for bp in p["blocks"]:
        x = x + 0.5 * ff(bp["ff_in"], x)
        x = x + attn(bp["attn"],
                     ln(x, (D,), torch.tensor(
                         bp["ln_att"]["weight"]),
                        torch.tensor(bp["ln_att"]["bias"])))
        x = x + convm(bp["conv"], x)
        x = x + 0.5 * ff(bp["ff_out"], x)
        x = ln(x, (D,), torch.tensor(bp["ln"]["weight"]),
               torch.tensor(bp["ln"]["bias"]))

    if pad_t or x.shape[0] > 1:
        x = x.reshape(1, -1, D)[:, :t]
    y = x[0] @ torch.tensor(p["proj"]["linear_1"]["weight"]) \
        + torch.tensor(p["proj"]["linear_1"]["bias"])
    y = torch.nn.functional.gelu(y)
    return y @ torch.tensor(p["proj"]["linear_2"]["weight"]) \
        + torch.tensor(p["proj"]["linear_2"]["bias"])


@pytest.mark.parametrize("t_mel", [16, 40])  # 40 -> unfold (T'=10 > 6)
def test_phi4mm_audio_encoder_golden(t_mel):
    import jax
    rng = np.random.default_rng(71)
    enc, cfg, params = _mk_params(rng)
    mel = rng.standard_normal((t_mel, MELS)).astype(np.float32)
    with torch.no_grad():
        want = _torch_forward(cfg, params, mel).numpy()
    ours = np.asarray(jax.device_get(
        jax.jit(enc)(jax.tree.map(np.asarray, params), mel)))
    assert ours.shape == want.shape
    np.testing.assert_allclose(ours, want, rtol=3e-4, atol=3e-4)


def test_phi4mm_audio_e2e(tmp_path):
    """Audio placeholders splice through the engine (deterministic)."""
    import sys
    sys.path.insert(0, "/root/repo/tests")
    from test_phi4mm import _build_parts

    from vllm_pq_tpu import LLM, SamplingParams
    d, *_ = _build_parts(tmp_path)
    # extend the config with the audio processor + re-dump
    cfgj = json.load(open(d / "config.json"))
    cfgj["audio_token_id"] = 121
    cfgj["audio_processor"] = {
        "name": "cascades",
        "config": dict(CFG)}
    json.dump(cfgj, open(d / "config.json", "w"))
    llm = LLM(model=str(d), load_format="dummy", dtype="float32",
              max_model_len=96, max_num_seqs=2,
              max_num_batched_tokens=96, block_size=16,
              num_kv_blocks=48, enable_prefix_caching=False)
    rng = np.random.default_rng(72)
    mel = rng.standard_normal((16, MELS)).astype(np.float32)
    prompt = {"prompt_token_ids": [3, 121, 9],
              "multi_modal_data": {"audio": {"mel": mel}}}
    got = llm.generate([prompt], SamplingParams(
        temperature=0.0, max_tokens=5,
        ignore_eos=True))[0].outputs[0].token_ids
    got2 = llm.generate([prompt], SamplingParams(
        temperature=0.0, max_tokens=5,
        ignore_eos=True))[0].outputs[0].token_ids
    assert got == got2 and len(got) == 5
