"""CLIP text encoder (Stable Diffusion 2 text tower) + tokenizer.

The reference conditions the UNet on CLIP embeddings of the task name
("depth", "optical flow", ...) via transformers' CLIPTextModel
(stablemtl_pipeline.py:395-424). Because the prompt set is 7 fixed strings
and the encoder is frozen, the TPU framework runs this model ONCE at setup
and caches a [n_tasks, L, 1024] embedding table — the text tower never
appears in the training/inference hot loop.

SD2 text config: vocab 49408, width 1024, 23 layers, 16 heads, MLP 4096,
gelu, causal mask, final LayerNorm; output is last_hidden_state.

Tokenization: a full byte-level BPE CLIPTokenizer (loads vocab.json /
merges.txt when available) with a deterministic hash fallback for
from-scratch training environments without the vocab files.
"""

from __future__ import annotations

import dataclasses
import functools
import gzip
import hashlib
import json
import os
from typing import List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

BOS_ID = 49406
EOS_ID = 49407

# CLIP's pre-tokenization pattern (openai simple_tokenizer):
#   <specials>|contractions|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+
# letters group, DIGITS SPLIT INDIVIDUALLY, everything else (incl. '_')
# groups in runs. Python re has no \p classes: [^\W\d_]+ == unicode
# letters, \d == one digit, (?:[^\s\w]|_)+ == non-letter/digit/space runs.
# A bare [\w]+ would glue digits/underscores into letter runs and silently
# tokenize differently from transformers' CLIPTokenizer.
import re as _re  # noqa: E402

PRETOKEN_PAT = _re.compile(
    r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
    r"|[^\W\d_]+|\d|(?:[^\s\w]|_)+", _re.IGNORECASE)


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_layers: int = 23
    num_heads: int = 16
    max_position_embeddings: int = 77
    layer_norm_eps: float = 1e-5
    hidden_act: str = "gelu"
    dtype: str = "float32"

    @property
    def jnp_dtype(self):
        return jnp.dtype(self.dtype)


def tiny_clip_config(**kw) -> CLIPTextConfig:
    base = dict(hidden_size=32, intermediate_size=64, num_layers=2,
                num_heads=2)
    base.update(kw)
    return CLIPTextConfig(**base)


class CLIPTextModel(nn.Module):
    config: CLIPTextConfig

    @nn.compact
    def __call__(self, input_ids):
        cfg = self.config
        dtype = cfg.jnp_dtype
        B, L = input_ids.shape

        tok = self.param(
            "token_embedding",
            nn.initializers.normal(0.02), (cfg.vocab_size, cfg.hidden_size))
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.02),
            (cfg.max_position_embeddings, cfg.hidden_size))
        h = (jnp.take(tok, input_ids, axis=0) + pos[None, :L]).astype(dtype)

        causal = jnp.triu(jnp.full((L, L), -jnp.inf, jnp.float32), k=1)
        head_dim = cfg.hidden_size // cfg.num_heads

        # transformers ACT2FN["gelu"] is the exact erf GELU, not tanh approx
        act = (lambda x: nn.gelu(x, approximate=False)) \
            if cfg.hidden_act == "gelu" else \
            (lambda x: x * jax.nn.sigmoid(1.702 * x))  # quick_gelu

        for i in range(cfg.num_layers):
            pre = f"layers_{i}"
            r = h
            h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                             name=f"{pre}_layer_norm1")(h).astype(dtype)
            q = nn.Dense(cfg.hidden_size, dtype=dtype, name=f"{pre}_q_proj")(h)
            k = nn.Dense(cfg.hidden_size, dtype=dtype, name=f"{pre}_k_proj")(h)
            v = nn.Dense(cfg.hidden_size, dtype=dtype, name=f"{pre}_v_proj")(h)
            q = q.reshape(B, L, cfg.num_heads, head_dim)
            k = k.reshape(B, L, cfg.num_heads, head_dim)
            v = v.reshape(B, L, cfg.num_heads, head_dim)
            scale = 1.0 / np.sqrt(head_dim)
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                preferred_element_type=jnp.float32) * scale
            logits = logits + causal[None, None]
            probs = jax.nn.softmax(logits, axis=-1).astype(dtype)
            attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                              preferred_element_type=jnp.float32)
            attn = attn.reshape(B, L, cfg.hidden_size).astype(dtype)
            h = r + nn.Dense(cfg.hidden_size, dtype=dtype,
                             name=f"{pre}_out_proj")(attn)

            r = h
            h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                             name=f"{pre}_layer_norm2")(h).astype(dtype)
            h = nn.Dense(cfg.intermediate_size, dtype=dtype,
                         name=f"{pre}_fc1")(h)
            h = act(h)
            h = nn.Dense(cfg.hidden_size, dtype=dtype, name=f"{pre}_fc2")(h)
            h = r + h

        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                         name="final_layer_norm")(h)
        return h.astype(dtype)


# ---------------------------------------------------------------------------
# Tokenization
# ---------------------------------------------------------------------------

@functools.lru_cache()
def _bytes_to_unicode():
    """GPT-2/CLIP reversible byte<->unicode mapping."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _get_pairs(word):
    return {(word[i], word[i + 1]) for i in range(len(word) - 1)}


class CLIPTokenizer:
    """Byte-level BPE tokenizer (CLIP flavor: every word ends with '</w>')."""

    def __init__(self, vocab_path: str, merges_path: str):
        with open(vocab_path) as f:
            self.encoder = json.load(f)
        opener = gzip.open if merges_path.endswith(".gz") else open
        with opener(merges_path, "rt") as f:
            merges = f.read().split("\n")
        if merges and merges[0].startswith("#"):
            merges = merges[1:]
        merges = [tuple(m.split()) for m in merges if m and len(m.split()) == 2]
        self.bpe_ranks = dict(zip(merges, range(len(merges))))
        self.byte_encoder = _bytes_to_unicode()
        self.cache = {}
        self.bos_id = self.encoder.get("<|startoftext|>", BOS_ID)
        self.eos_id = self.encoder.get("<|endoftext|>", EOS_ID)

    def _bpe(self, token: str) -> List[str]:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _get_pairs(word)
        if not pairs:
            return [token + "</w>"]
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, 1e10))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word = []
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
        out = list(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        specials = {"<|startoftext|>": self.bos_id,
                    "<|endoftext|>": self.eos_id}
        ids = []
        for token in PRETOKEN_PAT.findall(text.lower().strip()):
            if token in specials:  # atomic: never byte-BPE'd
                ids.append(specials[token])
                continue
            token = "".join(self.byte_encoder[b]
                            for b in token.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self._bpe(token))
        return ids


class HashTokenizer:
    """Deterministic fallback when CLIP vocab files are unavailable.

    Maps each whitespace word to a stable id in [1000, vocab). Sufficient for
    from-scratch training where prompts only need to be distinct and
    reproducible (the 7 task names); NOT compatible with pretrained CLIP
    weights (use CLIPTokenizer + real vocab files for parity evals).
    """

    def __init__(self, vocab_size: int = 49408):
        self.vocab_size = vocab_size
        self.bos_id = BOS_ID
        self.eos_id = EOS_ID

    def encode(self, text: str) -> List[int]:
        out = []
        for word in text.lower().strip().split():
            h = int(hashlib.sha256(word.encode()).hexdigest(), 16)
            out.append(1000 + h % (self.vocab_size - 2000))
        return out


def get_tokenizer(vocab_dir: str | None = None):
    """CLIPTokenizer if vocab files exist under vocab_dir, else HashTokenizer."""
    if vocab_dir:
        vp = os.path.join(vocab_dir, "vocab.json")
        mp = os.path.join(vocab_dir, "merges.txt")
        if os.path.exists(vp) and os.path.exists(mp):
            return CLIPTokenizer(vp, mp)
    return HashTokenizer()


def tokenize_batch(tokenizer, prompts: Sequence[str], max_length: int = 77,
                   padding: str = "longest") -> np.ndarray:
    """BOS + tokens + EOS, padded with EOS to the longest sequence.

    Matches transformers' CLIPTokenizer(padding='longest') used by the
    reference (stablemtl_pipeline.py:399-406).
    """
    seqs = []
    for p in prompts:
        ids = [tokenizer.bos_id] + tokenizer.encode(p)[: max_length - 2] + \
            [tokenizer.eos_id]
        seqs.append(ids)
    L = max(len(s) for s in seqs) if padding == "longest" else max_length
    out = np.full((len(seqs), L), tokenizer.eos_id, dtype=np.int32)
    for i, s in enumerate(seqs):
        out[i, : len(s)] = s
    return out
