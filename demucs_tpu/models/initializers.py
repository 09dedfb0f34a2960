"""Random parameter initializers with torch-equivalent distributions.

Shared by every model family; distributions match torch defaults (kaiming
uniform a=sqrt(5) for convs/linears => U(+-1/sqrt(fan_in))) and apply the
Demucs weight-rescale trick (``demucs/demucs.py:70-83``) at init.
"""

from __future__ import annotations

import math
import typing as tp

import jax.numpy as jnp
import numpy as np

from demucs_tpu.models import hlayers as hl
from demucs_tpu.models.transformer import TransformerSpec




class Init:
    """Numpy-based initializer producing torch-default distributions."""

    def __init__(self, seed: int):
        self.rng = np.random.default_rng(seed)

    def conv(self, shape, rescale: tp.Optional[float] = None) -> dict:
        # torch Conv default: kaiming_uniform(a=sqrt(5)) => U(+-1/sqrt(fan_in))
        fan_in = int(np.prod(shape[1:]))
        bound = 1.0 / math.sqrt(fan_in)
        w = self.rng.uniform(-bound, bound, size=shape).astype(np.float32)
        b = self.rng.uniform(-bound, bound, size=shape[0]).astype(np.float32)
        if rescale:
            # demucs.py:70-83 rescale trick
            scale = (w.std() / rescale) ** 0.5
            w /= scale
            b /= scale
        return {"weight": jnp.asarray(w), "bias": jnp.asarray(b)}

    def conv_tr(self, shape, rescale: tp.Optional[float] = None) -> dict:
        fan_in = int(np.prod(shape[1:]))  # torch uses weight.size(1)*kernel
        bound = 1.0 / math.sqrt(fan_in)
        w = self.rng.uniform(-bound, bound, size=shape).astype(np.float32)
        b = self.rng.uniform(-bound, bound, size=shape[1]).astype(np.float32)
        if rescale:
            scale = (w.std() / rescale) ** 0.5
            w /= scale
            b /= scale
        return {"weight": jnp.asarray(w), "bias": jnp.asarray(b)}

    def linear(self, out_f, in_f) -> dict:
        bound = 1.0 / math.sqrt(in_f)
        return {
            "weight": jnp.asarray(
                self.rng.uniform(-bound, bound, size=(out_f, in_f)).astype(np.float32)),
            "bias": jnp.asarray(
                self.rng.uniform(-bound, bound, size=out_f).astype(np.float32)),
        }

    def norm(self, dim) -> dict:
        return {"weight": jnp.ones(dim, jnp.float32), "bias": jnp.zeros(dim, jnp.float32)}

    def scale(self, dim, init) -> dict:
        return {"scale": jnp.full((dim,), init, jnp.float32)}

    def embedding(self, num, dim, smooth=False, scale=1.0) -> dict:
        w = self.rng.standard_normal((num, dim)).astype(np.float32)
        if smooth:
            w = np.cumsum(w, axis=0) / np.sqrt(np.arange(1, num + 1, dtype=np.float32))[:, None]
        return {"embedding": {"weight": jnp.asarray(w / scale)}}


def init_dconv(ini: Init, s: hl.DConvSpec, rescale: float) -> dict:
    hidden = int(s.channels / s.compress)
    layers = {}
    for d in range(abs(s.depth)):
        layer = {
            0: ini.conv((hidden, s.channels, s.kernel), rescale),
            1: ini.norm(hidden),
        }
        pos = 3
        if s.lstm:
            lstm_p = {}
            for ly in range(2):
                in_dim = hidden if ly == 0 else 2 * hidden
                bound = 1.0 / math.sqrt(hidden)
                for direction in ("", "_reverse"):
                    for name, shape in (
                        (f"weight_ih_l{ly}{direction}", (4 * hidden, in_dim)),
                        (f"weight_hh_l{ly}{direction}", (4 * hidden, hidden)),
                        (f"bias_ih_l{ly}{direction}", (4 * hidden,)),
                        (f"bias_hh_l{ly}{direction}", (4 * hidden,)),
                    ):
                        lstm_p[name] = jnp.asarray(
                            ini.rng.uniform(-bound, bound, size=shape).astype(np.float32))
            layer[pos] = {"lstm": lstm_p, "linear": ini.linear(hidden, 2 * hidden)}
            pos += 1
        if s.attn:
            qd = ini.conv((s.heads * s.ndecay, hidden, 1), rescale)
            qd = {"weight": qd["weight"] * 0.01, "bias": jnp.full_like(qd["bias"], -2.0)}
            layer[pos] = {
                "content": ini.conv((hidden, hidden, 1), rescale),
                "query": ini.conv((hidden, hidden, 1), rescale),
                "key": ini.conv((hidden, hidden, 1), rescale),
                "query_decay": qd,
                "proj": ini.conv((hidden, hidden, 1), rescale),
            }
            pos += 1
        layer[pos] = ini.conv((2 * s.channels, hidden, 1), rescale)
        layer[pos + 1] = ini.norm(2 * s.channels)
        layer[pos + 3] = ini.scale(s.channels, s.init)
        layers[d] = layer
    return {"layers": layers}


def init_enc(ini: Init, s: hl.EncSpec, rescale: float) -> dict:
    if s.multi_freqs:
        import dataclasses as _dc

        sub = _dc.replace(s, multi_freqs=())
        return {"layers": {k: init_enc(ini, sub, rescale)
                           for k in range(len(s.multi_freqs) + 1)}}
    p: dict = {}
    if s.freq:
        p["conv"] = ini.conv((s.chout, s.chin, s.kernel, 1), rescale)
    else:
        p["conv"] = ini.conv((s.chout, s.chin, s.kernel), rescale)
    if s.empty:
        return p
    if s.norm:
        p["norm1"] = ini.norm(s.chout)
    if s.rewrite:
        k = 1 + 2 * s.context
        if s.freq:
            p["rewrite"] = ini.conv((2 * s.chout, s.chout, k, k), rescale)
        else:
            p["rewrite"] = ini.conv((2 * s.chout, s.chout, k), rescale)
        if s.norm:
            p["norm2"] = ini.norm(2 * s.chout)
    if s.dconv is not None:
        p["dconv"] = init_dconv(ini, s.dconv, rescale)
    return p


def init_dec(ini: Init, s: hl.DecSpec, rescale: float) -> dict:
    if s.multi_freqs:
        import dataclasses as _dc

        sub = _dc.replace(s, multi_freqs=())
        return {"layers": {k: init_dec(ini, sub, rescale)
                           for k in range(len(s.multi_freqs) + 1)}}
    p: dict = {}
    if s.freq:
        p["conv_tr"] = ini.conv_tr((s.chin, s.chout, s.kernel, 1), rescale)
    else:
        p["conv_tr"] = ini.conv_tr((s.chin, s.chout, s.kernel), rescale)
    if s.norm:
        p["norm2"] = ini.norm(s.chout)
    if s.empty:
        return p
    if s.rewrite:
        k = 1 + 2 * s.context
        if s.freq:
            kh, kw = (k, k) if s.context_freq else (1, k)
            p["rewrite"] = ini.conv((2 * s.chin, s.chin, kh, kw), rescale)
        else:
            p["rewrite"] = ini.conv((2 * s.chin, s.chin, k), rescale)
        if s.norm:
            p["norm1"] = ini.norm(2 * s.chin)
    if s.dconv is not None:
        p["dconv"] = init_dconv(ini, s.dconv, rescale)
    return p


def init_transformer(ini: Init, s: TransformerSpec) -> dict:
    p: dict = {"layers": {}, "layers_t": {}}
    if s.norm_in or s.norm_in_group:
        p["norm_in"] = ini.norm(s.dim)
        p["norm_in_t"] = ini.norm(s.dim)
    if s.emb == "scaled":
        p["position_embeddings"] = ini.embedding(10000, s.dim, scale=0.2 / 3.0)
    for idx in range(s.num_layers):
        for key in ("layers", "layers_t"):
            if idx % 2 == s.classic_parity:
                bound = 1.0 / math.sqrt(s.dim)
                layer = {
                    "self_attn": {
                        "in_proj_weight": jnp.asarray(ini.rng.uniform(
                            -bound, bound, size=(3 * s.dim, s.dim)).astype(np.float32)),
                        "in_proj_bias": jnp.zeros(3 * s.dim, jnp.float32),
                        "out_proj": ini.linear(s.dim, s.dim),
                    },
                    "linear1": ini.linear(s.hidden_dim, s.dim),
                    "linear2": ini.linear(s.dim, s.hidden_dim),
                    "norm1": ini.norm(s.dim),
                    "norm2": ini.norm(s.dim),
                }
            else:
                bound = 1.0 / math.sqrt(s.dim)
                layer = {
                    "cross_attn": {
                        "in_proj_weight": jnp.asarray(ini.rng.uniform(
                            -bound, bound, size=(3 * s.dim, s.dim)).astype(np.float32)),
                        "in_proj_bias": jnp.zeros(3 * s.dim, jnp.float32),
                        "out_proj": ini.linear(s.dim, s.dim),
                    },
                    "linear1": ini.linear(s.hidden_dim, s.dim),
                    "linear2": ini.linear(s.dim, s.hidden_dim),
                    "norm1": ini.norm(s.dim),
                    "norm2": ini.norm(s.dim),
                    "norm3": ini.norm(s.dim),
                }
            if s.norm_first and s.norm_out:
                layer["norm_out"] = ini.norm(s.dim)
            if s.layer_scale:
                layer["gamma_1"] = ini.scale(s.dim, 1e-4)
                layer["gamma_2"] = ini.scale(s.dim, 1e-4)
            p[key][idx] = layer
    return p
