"""Torch/torchvision -> JAX weight porting.

Lets users of the reference bring their artifacts across:
- ``port_torchvision_vit`` / ``port_torchvision_resnet``: backbone state dicts
  (torchvision ``vit_b_16`` / ``resnet101``) -> our flax param trees.
- ``port_reference_state_dict``: a FULL reference checkpoint
  (``model_state_dict`` from train_*; torch module names like
  ``encoder.vit.encoder.layers.encoder_layer_3.self_attention.in_proj_weight``)
  -> our Captioner variables, enabling token-for-token greedy-parity checks and
  direct migration of trained ``best_model.pth`` files.

Conventions: torch Linear weight [out, in] -> kernel = W.T; conv OIHW -> HWIO;
LayerNorm weight/bias -> scale/bias; BatchNorm running stats -> batch_stats
collection.  The fused torch MHA in_proj splits into our qkv (self-attn) or
q_proj + kv_proj (cross-attn).  fc_out pads from vocab to the 128-aligned head
(extra columns zero; logits there are masked to -1e30 at runtime).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

PyTree = Any


def _t(w) -> np.ndarray:  # torch tensor/ndarray -> np
    if hasattr(w, "detach"):
        w = w.detach().cpu().numpy()
    return np.asarray(w)


def _j(prefix: str, name: str) -> str:
    return f"{prefix}.{name}" if prefix else name


def _linear(sd: Dict, prefix: str) -> Dict[str, np.ndarray]:
    return {"kernel": _t(sd[f"{prefix}.weight"]).T, "bias": _t(sd[f"{prefix}.bias"])}


def _ln(sd: Dict, prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}


def _conv(sd: Dict, prefix: str, bias: bool = True) -> Dict[str, np.ndarray]:
    out = {"kernel": _t(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def _bn(sd: Dict, prefix: str) -> Tuple[Dict, Dict]:
    params = {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}
    stats = {"mean": _t(sd[f"{prefix}.running_mean"]), "var": _t(sd[f"{prefix}.running_var"])}
    return params, stats


# ---------------------------------------------------------------------------
# ViT-B/16
# ---------------------------------------------------------------------------


def port_torchvision_vit(sd: Dict, num_layers: int = 12) -> Dict:
    """torchvision vit_b_16 state_dict -> params for models/vit.py ViT."""
    p: Dict[str, Any] = {
        "conv_proj": _conv(sd, "conv_proj"),
        "class_token": _t(sd["class_token"]),
        "pos_embedding": _t(sd["encoder.pos_embedding"]),
        "ln": _ln(sd, "encoder.ln"),
    }
    for i in range(num_layers):
        pre = f"encoder.layers.encoder_layer_{i}"
        in_w = _t(sd[f"{pre}.self_attention.in_proj_weight"])  # [3d, d]
        in_b = _t(sd[f"{pre}.self_attention.in_proj_bias"])
        p[f"encoder_layer_{i}"] = {
            "ln_1": _ln(sd, f"{pre}.ln_1"),
            "ln_2": _ln(sd, f"{pre}.ln_2"),
            "self_attention": {
                "qkv": {"kernel": in_w.T, "bias": in_b},
                "out": _linear(sd, f"{pre}.self_attention.out_proj"),
            },
            "mlp_0": _linear(sd, f"{pre}.mlp.0"),
            "mlp_3": _linear(sd, f"{pre}.mlp.3"),
        }
    return p


# ---------------------------------------------------------------------------
# ResNet
# ---------------------------------------------------------------------------


def port_torchvision_resnet(sd: Dict, stage_sizes=(3, 4, 23, 3), prefix: str = "") -> Tuple[Dict, Dict]:
    """torchvision resnet state_dict -> (params, batch_stats) for models/resnet.py.

    ``prefix`` handles the reference grid encoder's Sequential renaming
    (grid_transformer_model.py:51 wraps children()[:-2], so conv1 -> '0',
    bn1 -> '1', layer1 -> '4', ...): pass a mapping-style prefix via
    ``sequential=True`` in port_reference_state_dict instead.
    """
    P: Dict[str, Any] = {}
    S: Dict[str, Any] = {}

    def name(torch_name: str) -> str:
        return prefix + torch_name

    stem_p, stem_s = _bn(sd, name("bn1"))
    P["stem"] = {"conv": _conv(sd, name("conv1"), bias=False), "bn": stem_p}
    S["stem"] = {"bn": stem_s}
    for stage, blocks in enumerate(stage_sizes, start=1):
        for b in range(blocks):
            key = f"layer{stage}_{b}"
            tp = name(f"layer{stage}.{b}")
            blk_p: Dict[str, Any] = {}
            blk_s: Dict[str, Any] = {}
            for ci in (1, 2, 3):
                bn_p, bn_s = _bn(sd, f"{tp}.bn{ci}")
                blk_p[f"conv{ci}"] = {"conv": _conv(sd, f"{tp}.conv{ci}", bias=False), "bn": bn_p}
                blk_s[f"conv{ci}"] = {"bn": bn_s}
            if f"{tp}.downsample.0.weight" in sd:
                dn_p, dn_s = _bn(sd, f"{tp}.downsample.1")
                blk_p["downsample"] = {"conv": _conv(sd, f"{tp}.downsample.0", bias=False), "bn": dn_p}
                blk_s["downsample"] = {"bn": dn_s}
            P[key] = blk_p
            S[key] = blk_s
    return P, S


_SEQ_TO_RESNET = {"0": "conv1", "1": "bn1", "4": "layer1", "5": "layer2", "6": "layer3", "7": "layer4"}


def _desequentialize_resnet(sd: Dict, prefix: str) -> Dict:
    """Rename 'cnn.0.weight' style keys (reference Sequential wrap) back to
    'conv1.weight' style under a flat dict."""
    out = {}
    for k, v in sd.items():
        if not k.startswith(prefix):
            continue
        rest = k[len(prefix):]
        head, _, tail = rest.partition(".")
        mapped = _SEQ_TO_RESNET.get(head)
        if mapped is None:
            continue
        out[f"{mapped}.{tail}" if tail else mapped] = v
    return out


# ---------------------------------------------------------------------------
# Transformer decoder / encoder layers (torch nn.Transformer*Layer)
# ---------------------------------------------------------------------------


def _self_attn(sd: Dict, prefix: str) -> Dict:
    in_w = _t(sd[f"{prefix}.in_proj_weight"])
    in_b = _t(sd[f"{prefix}.in_proj_bias"])
    return {
        "qkv": {"kernel": in_w.T, "bias": in_b},
        "out": _linear(sd, f"{prefix}.out_proj"),
    }


def _cross_attn(sd: Dict, prefix: str) -> Dict:
    in_w = _t(sd[f"{prefix}.in_proj_weight"])  # [3d, d]: rows = [q; k; v]
    in_b = _t(sd[f"{prefix}.in_proj_bias"])
    d = in_w.shape[1]
    return {
        "q_proj": {"kernel": in_w[:d].T, "bias": in_b[:d]},
        "kv_proj": {"kernel": in_w[d:].T, "bias": in_b[d:]},
        "out": _linear(sd, f"{prefix}.out_proj"),
    }


def port_torch_decoder_layer(sd: Dict, prefix: str) -> Dict:
    return {
        "self_attn": _self_attn(sd, _j(prefix, "self_attn")),
        "cross_attn": _cross_attn(sd, _j(prefix, "multihead_attn")),
        "ffn": {"linear1": _linear(sd, _j(prefix, "linear1")), "linear2": _linear(sd, _j(prefix, "linear2"))},
        "norm1": _ln(sd, _j(prefix, "norm1")),
        "norm2": _ln(sd, _j(prefix, "norm2")),
        "norm3": _ln(sd, _j(prefix, "norm3")),
    }


def port_torch_encoder_layer(sd: Dict, prefix: str) -> Dict:
    return {
        "self_attn": _self_attn(sd, _j(prefix, "self_attn")),
        "ffn": {"linear1": _linear(sd, _j(prefix, "linear1")), "linear2": _linear(sd, _j(prefix, "linear2"))},
        "norm1": _ln(sd, _j(prefix, "norm1")),
        "norm2": _ln(sd, _j(prefix, "norm2")),
    }


def port_torch_caption_decoder(sd: Dict, prefix: str, num_layers: int, padded_vocab: int) -> Dict:
    emb = _t(sd[_j(prefix, "embedding.weight")])
    fc_w = _t(sd[_j(prefix, "fc_out.weight")]).T  # [d, vocab]
    fc_b = _t(sd[_j(prefix, "fc_out.bias")])
    d, vocab = fc_w.shape
    kernel = np.zeros((d, padded_vocab), dtype=fc_w.dtype)
    kernel[:, :vocab] = fc_w
    bias = np.zeros((padded_vocab,), dtype=fc_b.dtype)
    bias[:vocab] = fc_b
    out = {
        "embedding": {"embedding": emb},
        "fc_out": {"kernel": kernel, "bias": bias},
    }
    for i in range(num_layers):
        out[f"layer_{i}"] = port_torch_decoder_layer(sd, _j(prefix, f"transformer_decoder.layers.{i}"))
    return out


# ---------------------------------------------------------------------------
# Full reference checkpoints
# ---------------------------------------------------------------------------


def port_reference_state_dict(sd: Dict, config: Dict, vocab_size: int) -> Dict:
    """Reference ``model_state_dict`` -> our variables {'params', 'batch_stats'}.

    Handles both model types (model_type from the config dict embedded in the
    checkpoint, scripts/inference.py:20-32).
    """

    def padded(v: int) -> int:
        return ((v + 127) // 128) * 128

    model_type = config.get("model_type", "vit_transformer")
    num_dec = config.get("num_decoder_layers", 6)
    params: Dict[str, Any] = {
        "decoder": port_torch_caption_decoder(sd, "decoder", num_dec, padded(vocab_size))
    }
    batch_stats: Dict[str, Any] = {}
    if model_type == "vit_transformer":
        vit_sd = {k[len("encoder.vit."):]: v for k, v in sd.items() if k.startswith("encoder.vit.")}
        params["encoder"] = {
            "vit": port_torchvision_vit(vit_sd),
            "projection": _linear(sd, "encoder.projection"),
        }
    else:
        resnet_sd = _desequentialize_resnet(sd, "encoder.cnn.")
        cnn_p, cnn_s = port_torchvision_resnet(resnet_sd)
        num_enc = config.get("num_encoder_layers", 6)
        enc: Dict[str, Any] = {
            "cnn": cnn_p,
            "projection": _conv(sd, "encoder.projection"),
        }
        for i in range(num_enc):
            enc[f"layer_{i}"] = port_torch_encoder_layer(sd, f"encoder.transformer_encoder.layers.{i}")
        params["encoder"] = enc
        batch_stats = {"encoder": {"cnn": cnn_s}}
    return {"params": params, "batch_stats": batch_stats}


def load_reference_checkpoint(path: str):
    """Load a reference ``best_model.pth`` -> (Captioner, config, extras)."""
    import torch

    from image_caption_tpu.models.runtime import Captioner, build_module

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    config = ckpt.get("config", {})
    sd = ckpt["model_state_dict"]
    vocab_size = sd["decoder.embedding.weight"].shape[0]
    variables = port_reference_state_dict(sd, config, vocab_size)
    module = build_module(vocab_size, config)
    extras = {k: v for k, v in ckpt.items() if k not in ("model_state_dict", "optimizer_state_dict")}
    return Captioner(module, variables, config), config, extras


def load_pretrained_backbone_into(module, variables: Dict) -> Dict:
    """Port ImageNet torchvision backbone weights into freshly-initialized
    variables (requires the torchvision weight cache; raises cleanly offline)."""
    from image_caption_tpu.models.captioner import GridCaptioningModel

    params = dict(variables["params"])
    if isinstance(module, GridCaptioningModel):
        from torchvision.models import ResNet101_Weights, resnet101

        net = resnet101(weights=ResNet101_Weights.DEFAULT)
        cnn_p, cnn_s = port_torchvision_resnet(net.state_dict())
        enc = dict(params["encoder"])
        enc["cnn"] = cnn_p
        params["encoder"] = enc
        bs = dict(variables.get("batch_stats", {}))
        bs_enc = dict(bs.get("encoder", {}))
        bs_enc["cnn"] = cnn_s
        bs["encoder"] = bs_enc
        return {"params": params, "batch_stats": bs}
    else:
        from torchvision.models import ViT_B_16_Weights, vit_b_16

        net = vit_b_16(weights=ViT_B_16_Weights.DEFAULT)
        enc = dict(params["encoder"])
        enc["vit"] = port_torchvision_vit(net.state_dict())
        params["encoder"] = enc
        return {"params": params, **{k: v for k, v in variables.items() if k != "params"}}
