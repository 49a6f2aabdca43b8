"""CLIP ViT-L/14 text encoder + tokenizer for the SD prompt path.

The reference conditions DiffAttack's UNet on a per-image prompt built from
the ImageNet label text (``transferattack/generation/diffattack.py:659-759``
— prompt machinery + ``TextLabel``), encoded by the SD pipeline's CLIP text
encoder.  This module provides:

* ``CLIPTextEncoder`` — the transformers ``CLIPTextModel`` architecture
  (12 pre-LN layers, width 768, 12 heads, quick-GELU, causal mask, final
  LayerNorm), module nesting matching the HF state_dict under the generic
  converter: ``text_model.encoder.layers.0.self_attn.q_proj.weight`` →
  ``text_model/encoder/layers_0/self_attn/q_proj/kernel``.
* ``SDTokenizer`` — a byte-pair-free CLIP tokenizer stand-in: loads the real
  vocab/merges when ``clip_vocab.json`` + ``clip_merges.txt`` exist in
  ``$TA_TPU_WEIGHTS_DIR`` (converted offline alongside the SD weights), and
  otherwise falls back to deterministic hashed token ids — mechanically
  valid conditioning that becomes the reference prompt path once real
  artifacts are supplied.
"""
from __future__ import annotations

import os
import warnings
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

MAX_TOKENS = 77
BOS, EOS = 49406, 49407


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    heads: int

    @nn.compact
    def __call__(self, x, mask):
        B, N, C = x.shape
        dh = C // self.heads
        q = nn.Dense(C, name="q_proj")(x)
        k = nn.Dense(C, name="k_proj")(x)
        v = nn.Dense(C, name="v_proj")(x)
        q = q.reshape(B, N, self.heads, dh).transpose(0, 2, 1, 3)
        k = k.reshape(B, N, self.heads, dh).transpose(0, 2, 1, 3)
        v = v.reshape(B, N, self.heads, dh).transpose(0, 2, 1, 3)
        w = jnp.einsum("bhnd,bhmd->bhnm", q, k) * (dh ** -0.5) + mask
        w = jax.nn.softmax(w, axis=-1)
        a = jnp.einsum("bhnm,bhmd->bhnd", w, v)
        a = a.transpose(0, 2, 1, 3).reshape(B, N, C)
        return nn.Dense(C, name="out_proj")(a)


class CLIPMlp(nn.Module):
    @nn.compact
    def __call__(self, x):
        h = nn.Dense(x.shape[-1] * 4, name="fc1")(x)
        return nn.Dense(x.shape[-1], name="fc2")(quick_gelu(h))


class CLIPLayer(nn.Module):
    heads: int

    @nn.compact
    def __call__(self, x, mask):
        h = nn.LayerNorm(epsilon=1e-5, name="layer_norm1")(x)
        x = x + CLIPAttention(self.heads, name="self_attn")(h, mask)
        h = nn.LayerNorm(epsilon=1e-5, name="layer_norm2")(x)
        return x + CLIPMlp(name="mlp")(h)


class CLIPTextEncoder(nn.Module):
    """``CLIPTextModel`` (openai/clip-vit-large-patch14 text tower)."""

    vocab_size: int = 49408
    width: int = 768
    layers: int = 12
    heads: int = 12
    max_tokens: int = MAX_TOKENS

    @nn.compact
    def __call__(self, ids):
        B, N = ids.shape
        tok = nn.Embed(self.vocab_size, self.width,
                       name="token_embedding")(ids)
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.01), (self.max_tokens, self.width))
        x = tok + pos[None, :N]
        mask = jnp.triu(jnp.full((N, N), -jnp.inf, jnp.float32), k=1)
        mask = mask[None, None]
        for i in range(self.layers):
            x = CLIPLayer(self.heads, name=f"layers_{i}")(x, mask)
        return nn.LayerNorm(epsilon=1e-5, name="final_layer_norm")(x)


class SDTokenizer:
    """CLIP BPE when vocab/merges artifacts exist; hashed fallback else."""

    def __init__(self, weights_dir: Optional[str] = None):
        root = weights_dir or os.environ.get(
            "TA_TPU_WEIGHTS_DIR", os.path.join(os.getcwd(), "weights"))
        self._bpe = None
        vocab_p = os.path.join(root, "clip_vocab.json")
        merges_p = os.path.join(root, "clip_merges.txt")
        if os.path.exists(vocab_p) and os.path.exists(merges_p):
            self._bpe = _CLIPBPE(vocab_p, merges_p)
        else:
            warnings.warn(
                "SDTokenizer: clip_vocab.json/clip_merges.txt not found; "
                "using deterministic hashed token ids (prompts condition the "
                "UNet mechanically but are not real CLIP tokens).")

    def __call__(self, texts: List[str]) -> np.ndarray:
        out = np.full((len(texts), MAX_TOKENS), EOS, np.int32)
        for bi, text in enumerate(texts):
            if self._bpe is not None:
                toks = self._bpe.encode(text)[: MAX_TOKENS - 2]
            else:
                toks = [
                    (hash(w) % (BOS - 1)) + 1
                    for w in text.lower().split()[: MAX_TOKENS - 2]
                ]
            ids = [BOS] + list(toks) + [EOS]
            out[bi, : len(ids)] = ids
        return out


class _CLIPBPE:
    """Minimal CLIP byte-pair encoder over converted vocab/merges files."""

    def __init__(self, vocab_path: str, merges_path: str):
        import json
        import re

        with open(vocab_path) as f:
            self.encoder = json.load(f)
        with open(merges_path) as f:
            lines = f.read().split("\n")
        merges = [tuple(m.split()) for m in lines
                  if m and not m.startswith("#") and len(m.split()) == 2]
        self.bpe_ranks = dict(zip(merges, range(len(merges))))
        self.pat = re.compile(
            r"'s|'t|'re|'ve|'m|'ll|'d|[a-z]+|[0-9]|[^\sa-z0-9]+",
            re.IGNORECASE)
        self.cache = {}

    def _bpe(self, token: str):
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        while len(word) > 1:
            pairs = set(zip(word[:-1], word[1:]))
            bigram = min(
                pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word, i = [], 0
            while i < len(word):
                if (i < len(word) - 1 and word[i] == first
                        and word[i + 1] == second):
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
        self.cache[token] = word
        return word

    def encode(self, text: str):
        ids = []
        for tok in self.pat.findall(text.lower().strip()):
            for piece in self._bpe(tok):
                ids.append(self.encoder.get(
                    piece, self.encoder.get("<|endoftext|>", EOS)))
        return ids
