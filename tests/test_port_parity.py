"""Numerical parity vs torch modules through the weight porter.

Builds torch modules with the same architecture as the reference (torch.nn
Transformer layers with batch_first, torchvision backbones), ports their weights
via utils/port_torch, and checks forward parity in float32 — the foundation for
token-for-token greedy parity against reference checkpoints.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from image_caption_tpu.core.dtypes import DTypePolicy
from image_caption_tpu.models.decoder import TransformerDecoder
from image_caption_tpu.models.layers import TransformerEncoderLayer
from image_caption_tpu.utils import port_torch as port

F32 = DTypePolicy(compute_dtype=jnp.float32)


def _init_jax(module, *args):
    key = jax.random.PRNGKey(0)
    return module.init({"params": key, "dropout": key}, *args)


@pytest.fixture(scope="module")
def torch_seed():
    torch.manual_seed(0)
    return 0


def test_decoder_layer_parity(torch_seed):
    d, h, ff = 32, 4, 64
    tlayer = torch.nn.TransformerDecoderLayer(d, h, ff, dropout=0.0, batch_first=True).eval()
    B, T, S = 2, 5, 7
    x = torch.randn(B, T, d)
    mem = torch.randn(B, S, d)
    causal = torch.triu(torch.full((T, T), float("-inf")), diagonal=1)
    with torch.no_grad():
        ref = tlayer(x, mem, tgt_mask=causal).numpy()

    from image_caption_tpu.models.layers import TransformerDecoderLayer as JaxLayer

    jl = JaxLayer(d, h, ff, dropout=0.0, policy=F32)
    vars_ = _init_jax(jl, jnp.asarray(x.numpy()), jnp.asarray(mem.numpy()))
    sd = {k: v for k, v in tlayer.state_dict().items()}
    ported = port.port_torch_decoder_layer(sd, "")
    # port_torch_decoder_layer expects prefixed names; rebuild with prefix=''
    ported = {
        "self_attn": port._self_attn(sd, "self_attn"),
        "cross_attn": port._cross_attn(sd, "multihead_attn"),
        "ffn": {"linear1": port._linear(sd, "linear1"), "linear2": port._linear(sd, "linear2")},
        "norm1": port._ln(sd, "norm1"),
        "norm2": port._ln(sd, "norm2"),
        "norm3": port._ln(sd, "norm3"),
    }
    out = jl.apply({"params": ported}, jnp.asarray(x.numpy()), jnp.asarray(mem.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


class _TorchCaptionDecoder(torch.nn.Module):
    """Same architecture as the reference TransformerDecoder (vit:103-182)."""

    def __init__(self, vocab, d, h, layers, ff, max_len=60):
        super().__init__()
        import math

        self.d = d
        self.embedding = torch.nn.Embedding(vocab, d)
        pe = torch.zeros(max_len, d)
        pos = torch.arange(0, max_len, dtype=torch.float).unsqueeze(1)
        div = torch.exp(torch.arange(0, d, 2).float() * (-math.log(10000.0) / d))
        pe[:, 0::2] = torch.sin(pos * div)
        pe[:, 1::2] = torch.cos(pos * div)
        self.register_buffer("pe", pe.unsqueeze(0))
        layer = torch.nn.TransformerDecoderLayer(d, h, ff, dropout=0.0, batch_first=True)
        self.transformer_decoder = torch.nn.TransformerDecoder(layer, layers)
        self.fc_out = torch.nn.Linear(d, vocab)

    def forward(self, tgt, memory, tgt_key_padding_mask=None):
        import math

        T = tgt.shape[1]
        x = self.embedding(tgt) * math.sqrt(self.d)
        x = x + self.pe[:, :T]
        causal = torch.triu(torch.full((T, T), float("-inf")), diagonal=1)
        out = self.transformer_decoder(
            x, memory, tgt_mask=causal, tgt_key_padding_mask=tgt_key_padding_mask
        )
        return self.fc_out(out)


@pytest.fixture(scope="module")
def torch_and_jax_decoder(torch_seed):
    vocab, d, h, layers, ff = 19, 32, 4, 2, 64
    tdec = _TorchCaptionDecoder(vocab, d, h, layers, ff).eval()
    jdec = TransformerDecoder(
        vocab_size=vocab, d_model=d, nhead=h, num_layers=layers, dim_feedforward=ff,
        dropout=0.0, max_len=60, policy=F32,
    )
    mem = np.random.default_rng(0).normal(size=(3, 6, d)).astype(np.float32)
    tgt = np.random.default_rng(1).integers(0, vocab, size=(3, 8)).astype(np.int64)
    vars_ = _init_jax(jdec, jnp.asarray(tgt.astype(np.int32)), jnp.asarray(mem))
    sd = tdec.state_dict()
    ported = port.port_torch_caption_decoder(sd, "", jdec.num_layers, jdec.padded_vocab)
    # strip the leading '.' artifacts: port expects prefix like 'decoder'
    return tdec, jdec, {"params": ported}, mem, tgt


def test_caption_decoder_logit_parity(torch_and_jax_decoder):
    tdec, jdec, vars_, mem, tgt = torch_and_jax_decoder
    with torch.no_grad():
        ref = tdec(torch.from_numpy(tgt), torch.from_numpy(mem)).numpy()
    out = jdec.apply(vars_, jnp.asarray(tgt.astype(np.int32)), jnp.asarray(mem))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_caption_decoder_padding_mask_parity(torch_and_jax_decoder):
    tdec, jdec, vars_, mem, tgt = torch_and_jax_decoder
    lengths = np.array([8, 5, 3])
    pad_mask = np.zeros((3, 8), dtype=bool)
    for i, l in enumerate(lengths):
        pad_mask[i, l:] = True
    with torch.no_grad():
        ref = tdec(
            torch.from_numpy(tgt), torch.from_numpy(mem),
            tgt_key_padding_mask=torch.from_numpy(pad_mask),
        ).numpy()
    out = jdec.apply(
        vars_, jnp.asarray(tgt.astype(np.int32)), jnp.asarray(mem),
        tgt_key_padding_mask=jnp.asarray(pad_mask),
    )
    # valid (non-pad) positions must match; padded rows attend to garbage either way
    for i, l in enumerate(lengths):
        np.testing.assert_allclose(np.asarray(out)[i, :l], ref[i, :l], atol=2e-5)


def test_greedy_token_parity(torch_and_jax_decoder):
    """Token-for-token greedy parity: torch full-prefix loop vs KV-cached engine."""
    from image_caption_tpu.decode import engine

    tdec, jdec, vars_, mem, _ = torch_and_jax_decoder
    START, END, max_len = 17, 18, 14
    gen = torch.full((3, 1), START, dtype=torch.long)
    with torch.no_grad():
        for _ in range(max_len - 1):
            logits = tdec(gen, torch.from_numpy(mem))
            nxt = logits[:, -1].argmax(-1)
            gen = torch.cat([gen, nxt.unsqueeze(1)], dim=1)
            if (nxt == END).all():
                break
    ref_tokens = gen.numpy()
    fast = np.asarray(
        engine.greedy_decode(jdec, vars_, jnp.asarray(mem), start_id=START, end_id=END, max_len=max_len)
    )
    L = ref_tokens.shape[1]
    np.testing.assert_array_equal(fast[:, :L], ref_tokens)


def test_encoder_layer_parity(torch_seed):
    d, h, ff = 32, 4, 64
    tlayer = torch.nn.TransformerEncoderLayer(d, h, ff, dropout=0.0, batch_first=True).eval()
    x = torch.randn(2, 5, d)
    with torch.no_grad():
        ref = tlayer(x).numpy()
    jl = TransformerEncoderLayer(d, h, ff, dropout=0.0, policy=F32)
    _ = _init_jax(jl, jnp.asarray(x.numpy()))
    sd = tlayer.state_dict()
    ported = {
        "self_attn": port._self_attn(sd, "self_attn"),
        "ffn": {"linear1": port._linear(sd, "linear1"), "linear2": port._linear(sd, "linear2")},
        "norm1": port._ln(sd, "norm1"),
        "norm2": port._ln(sd, "norm2"),
    }
    out = jl.apply({"params": ported}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)
