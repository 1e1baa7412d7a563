"""CLIP text encoder + BPE tokenizer for the I2VGen-XL enhancement prompts.

The reference's stage-2 pipeline encodes two fixed quality prompts with the
i2vgen-xl checkpoint's CLIP text model (pipeline_i2vgen_xl.py:753-761;
prompts at i2v_enhance_interface.py:87-88).  This is the OpenCLIP ViT-H
text tower in HF layout: token+position embeddings, 24 pre-LN causal
transformer layers (width 1024, 16 heads, GELU), final layer norm.

The tokenizer is a from-scratch CLIP BPE implementation reading the
vocab.json / merges.txt that ship inside the checkpoint folder — no
network access needed at runtime.
"""

from __future__ import annotations

import dataclasses
import functools
import gzip
import html
import json
import re
from typing import Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from streamingt2v_tpu.ops import attention, layer_norm


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    width: int = 1024
    layers: int = 24
    heads: int = 16
    max_length: int = 77
    mlp_ratio: float = 4.0
    hidden_act: str = "gelu"  # laion ViT-H text tower uses plain GELU

    @classmethod
    def tiny(cls) -> "CLIPTextConfig":
        return cls(vocab_size=64, width=32, layers=2, heads=2, max_length=8)


class CLIPTextLayer(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, x, causal_bias):
        c = x.shape[-1]
        s1 = self.param("ln1_scale", nn.initializers.ones, (c,))
        b1 = self.param("ln1_bias", nn.initializers.zeros, (c,))
        h = layer_norm(x, s1, b1)
        heads = self.cfg.heads
        d = c // heads
        q = nn.Dense(c, name="q_proj")(h)
        k = nn.Dense(c, name="k_proj")(h)
        v = nn.Dense(c, name="v_proj")(h)
        n, L, _ = q.shape
        qh = q.reshape(n, L, heads, d).transpose(0, 2, 1, 3)
        kh = k.reshape(n, L, heads, d).transpose(0, 2, 1, 3)
        vh = v.reshape(n, L, heads, d).transpose(0, 2, 1, 3)
        from streamingt2v_tpu.ops.attention import dot_product_attention

        o = dot_product_attention(qh, kh, vh, bias=causal_bias)
        o = o.transpose(0, 2, 1, 3).reshape(n, L, c)
        x = x + nn.Dense(c, name="out_proj")(o)
        s2 = self.param("ln2_scale", nn.initializers.ones, (c,))
        b2 = self.param("ln2_bias", nn.initializers.zeros, (c,))
        h = layer_norm(x, s2, b2)
        h = nn.Dense(int(c * self.cfg.mlp_ratio), name="fc1")(h)
        if self.cfg.hidden_act == "quick_gelu":
            h = h * jax.nn.sigmoid(1.702 * h)
        else:
            h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(h.dtype)
        return x + nn.Dense(c, name="fc2")(h)


class CLIPTextTower(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, token_ids: jax.Array) -> jax.Array:
        """token_ids: (B, L) int32 -> last hidden state (B, L, width)."""
        cfg = self.cfg
        emb = nn.Embed(cfg.vocab_size, cfg.width, name="token_embedding")(token_ids)
        pos = self.param("position_embedding", nn.initializers.normal(0.01),
                         (cfg.max_length, cfg.width))
        L = token_ids.shape[1]
        x = emb + pos[:L]
        causal = jnp.triu(jnp.full((L, L), -1e9, jnp.float32), k=1)
        for i in range(cfg.layers):
            x = CLIPTextLayer(cfg, name=f"layer_{i}")(x, causal)
        s = self.param("final_ln_scale", nn.initializers.ones, (cfg.width,))
        b = self.param("final_ln_bias", nn.initializers.zeros, (cfg.width,))
        return layer_norm(x, s, b)


# --------------------------------------------------------------------------
# CLIP BPE tokenizer (file-based, no network)
# --------------------------------------------------------------------------

@functools.lru_cache()
def _bytes_to_unicode() -> Dict[int, str]:
    bs = (list(range(ord("!"), ord("~") + 1)) + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(2**8):
        if b not in bs:
            bs.append(b)
            cs.append(2**8 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _get_pairs(word: Tuple[str, ...]):
    return {(word[i], word[i + 1]) for i in range(len(word) - 1)}


class CLIPTokenizer:
    """Byte-pair encoding tokenizer with CLIP's text cleaning and the
    <|startoftext|>/<|endoftext|> framing, padded to max_length."""

    PAT = re.compile(
        r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+"
        if False else
        r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[a-zA-Z]+|[0-9]|[^\sa-zA-Z0-9]+",
        re.IGNORECASE,
    )

    def __init__(self, vocab: Dict[str, int], merges: List[Tuple[str, str]],
                 max_length: int = 77):
        self.encoder = vocab
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.byte_encoder = _bytes_to_unicode()
        self.max_length = max_length
        self.sot = vocab.get("<|startoftext|>")
        self.eot = vocab.get("<|endoftext|>")
        self.cache: Dict[str, str] = {}

    @classmethod
    def synthetic(cls, max_length: int = 77) -> "CLIPTokenizer":
        """Byte-level tokenizer with an empty merge table — a functional
        stand-in for the published 49k-BPE vocab when its files are
        unavailable (random-weights smoke runs at production size).  Every
        byte maps to a stable id < 514, well inside the text tower's 49408
        vocab; framing/padding/cleaning behave exactly like the real one."""
        chars = list(_bytes_to_unicode().values())
        vocab = {c: i for i, c in enumerate(chars)}
        vocab.update({c + "</w>": len(chars) + i for i, c in enumerate(chars)})
        vocab["<|startoftext|>"] = 2 * len(chars)
        vocab["<|endoftext|>"] = 2 * len(chars) + 1
        return cls(vocab, [], max_length)

    @classmethod
    def from_files(cls, vocab_path: str, merges_path: str, max_length: int = 77):
        with open(vocab_path) as f:
            vocab = json.load(f)
        opener = gzip.open if merges_path.endswith(".gz") else open
        with opener(merges_path, "rt") as f:
            lines = f.read().split("\n")
        merges = [tuple(l.split()) for l in lines
                  if l and not l.startswith("#") and len(l.split()) == 2]
        return cls(vocab, merges, max_length)

    def _bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: List[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        text = html.unescape(html.unescape(text))
        text = re.sub(r"\s+", " ", text.strip()).lower()
        ids: List[int] = []
        for token in re.findall(self.PAT, text):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self._bpe(token).split(" "))
        return ids

    def __call__(self, texts: List[str]) -> np.ndarray:
        """-> (B, max_length) int32, sot + ids + eot, eot-padded."""
        out = np.full((len(texts), self.max_length), self.eot, np.int32)
        for i, text in enumerate(texts):
            ids = [self.sot] + self.encode(text)[: self.max_length - 2] + [self.eot]
            out[i, : len(ids)] = ids
        return out
