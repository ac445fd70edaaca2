"""Optimus text VAE: BERT encoder -> 768-d latent -> GPT-2 decoder.

Capability parity with `/root/reference/lib/model_zoo/optimus.py` and its
vendored towers (`optimus_models/optimus_bert.py:1348-1437`,
`optimus_models/optimus_gpt2.py:813-1121`):

- encode (`optimus.py:729-743`): lowercased wordpiece ids -> BERT -> pooled
  CLS -> ``linear`` -> (mu, logvar); inference returns the posterior MEAN.
- decode (`optimus.py:745-763`, sampler :662-688): GPT-2 with the latent
  injected twice — as a length-1 KV "memory" prefix per layer
  (``linear``: 768 -> hidden*n_layer, optimus_gpt2.py:879-893) and as an
  embedding offset added to every token (``linear_emb``, :876,951-953);
  autoregressive sampling, temperature 1 / top-p 1.0, <=30 tokens, EOS-forced
  at the cap (:685-687).

TPU-first re-design: the reference's per-sample Python while-loop (which
re-runs the whole prefix every step) becomes one batched `lax.scan` with a
static-shape KV cache; top-k/top-p filtering is a vectorized logit transform.
Submodule names follow the torch state-dict so `optimus-vae.pth` converts
mechanically (GPT-2 Conv1D kernels are pre-transposed by `load_torch`).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Mapping, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vdtpu.config.registry import register
from vdtpu.models.layers import Dtype
from vdtpu.models.layers import dense as _dense
from vdtpu.ops.attention import scaled_dot_product_attention

# Text-VAE towers are never quantized — the int8 serving policy scopes to
# the diffusers (see the matching note in clip.py; uncalibrated sites
# would fall back to batch-dynamic absmax quantization).
dense = functools.partial(_dense, quant=False)

# GPT-2 vocab with Optimus' added specials (ref optimus.py:30-34):
# base 50257 + <PAD>=50257, <BOS>=50258, <EOS>=50259.
GPT2_PAD, GPT2_BOS, GPT2_EOS = 50257, 50258, 50259
MAX_DECODE_LEN = 30


# --------------------------------------------------------------------------
# BERT encoder tower
# --------------------------------------------------------------------------

class BertEmbeddings(nn.Module):
    cfg: Mapping[str, Any]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, token_type_ids=None):
        c = self.cfg
        words = nn.Embed(c["vocab_size"], c["hidden_size"], dtype=self.dtype,
                         name="word_embeddings")(input_ids)
        pos = nn.Embed(c["max_position_embeddings"], c["hidden_size"],
                       dtype=self.dtype, name="position_embeddings")(
            jnp.arange(input_ids.shape[1])[None])
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        types = nn.Embed(c["type_vocab_size"], c["hidden_size"], dtype=self.dtype,
                         name="token_type_embeddings")(token_type_ids)
        x = words + pos + types
        return nn.LayerNorm(epsilon=float(c.get("layer_norm_eps", 1e-12)),
                            dtype=jnp.float32, name="LayerNorm")(x).astype(self.dtype)


class BertLayer(nn.Module):
    cfg: Mapping[str, Any]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        c = self.cfg
        hsz, heads = c["hidden_size"], c["num_attention_heads"]
        hd = hsz // heads
        b, n, _ = x.shape
        eps = float(c.get("layer_norm_eps", 1e-12))
        q = dense(hsz, "attention.self.query", self.dtype)(x)
        k = dense(hsz, "attention.self.key", self.dtype)(x)
        v = dense(hsz, "attention.self.value", self.dtype)(x)
        sh = lambda t: t.reshape(b, n, heads, hd)
        a = scaled_dot_product_attention(sh(q), sh(k), sh(v), mask=mask,
                                         scale=hd ** -0.5)
        a = dense(hsz, "attention.output.dense", self.dtype)(a.reshape(b, n, hsz))
        x = nn.LayerNorm(epsilon=eps, dtype=jnp.float32,
                         name="attention.output.LayerNorm")(x + a).astype(self.dtype)
        h = dense(c["intermediate_size"], "intermediate.dense", self.dtype)(x)
        h = nn.gelu(h, approximate=False)
        h = dense(hsz, "output.dense", self.dtype)(h)
        return nn.LayerNorm(epsilon=eps, dtype=jnp.float32,
                            name="output.LayerNorm")(x + h).astype(self.dtype)


@register("optimus_bert_connector")
class OptimusBertConnector(nn.Module):
    """BERT tower + pooler + (mu, logvar) head (ref optimus_bert.py:1348-1437)."""
    config: Mapping[str, Any] = None
    latent_size: int = 768
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask=None):
        c = dict(self.config)
        if attention_mask is None:
            attention_mask = (input_ids > 0).astype(jnp.float32)
        mask = attention_mask[:, None, None, :] > 0.5  # [B,1,1,N] keep-mask
        x = BertEmbeddings(c, self.dtype, name="embeddings")(input_ids)
        for i in range(c["num_hidden_layers"]):
            x = BertLayer(c, self.dtype, name=f"encoder.layer.{i}")(x, mask)
        pooled = dense(c["hidden_size"], "pooler.dense", self.dtype)(x[:, 0])
        pooled = jnp.tanh(pooled)
        mu_logvar = dense(2 * self.latent_size, "linear", self.dtype,
                          use_bias=False)(pooled)
        return mu_logvar  # chunk -> (mu, logvar)


# --------------------------------------------------------------------------
# GPT-2 decoder tower with latent injection
# --------------------------------------------------------------------------

class GPT2Block(nn.Module):
    """Pre-LN GPT-2 block; latent KV prefix enters attention raw (un-projected),
    exactly like the reference's layer_past path (optimus_gpt2.py:188-196)."""
    cfg: Mapping[str, Any]
    dtype: Dtype = jnp.float32

    def setup(self):
        c = dict(self.cfg)
        hsz = c["n_embd"]
        eps = float(c.get("layer_norm_epsilon", 1e-5))
        self.ln_1 = nn.LayerNorm(epsilon=eps, dtype=jnp.float32, name="ln_1")
        self.ln_2 = nn.LayerNorm(epsilon=eps, dtype=jnp.float32, name="ln_2")
        self.c_attn = dense(3 * hsz, "attn.c_attn", self.dtype)
        self.c_proj_attn = dense(hsz, "attn.c_proj", self.dtype)
        self.c_fc = dense(4 * hsz, "mlp.c_fc", self.dtype)
        self.c_proj_mlp = dense(hsz, "mlp.c_proj", self.dtype)
        self.heads = c["n_head"]
        self.hsz = hsz

    def _split(self, t):
        b, n, _ = t.shape
        return t.reshape(b, n, self.heads, self.hsz // self.heads)

    def qkv(self, x):
        q, k, v = jnp.split(self.c_attn(self.ln_1(x).astype(self.dtype)), 3, axis=-1)
        return q, k, v

    def finish(self, x, attn_out):
        a = self.c_proj_attn(attn_out)
        x = x + a
        m = self.c_proj_mlp(nn.gelu(self.c_fc(self.ln_2(x).astype(self.dtype)),
                                    approximate=True))
        return x + m

    def __call__(self, x, latent_kv, mask):
        """Full-sequence forward. latent_kv: [B, 1, hsz] used as both k and v."""
        q, k, v = self.qkv(x)
        k = jnp.concatenate([latent_kv, k], axis=1)
        v = jnp.concatenate([latent_kv, v], axis=1)
        a = scaled_dot_product_attention(
            self._split(q), self._split(k), self._split(v), mask=mask,
            scale=(self.hsz // self.heads) ** -0.5)
        return self.finish(x, a.reshape(x.shape))

    def decode_step(self, x, k_cache, v_cache, pos):
        """Single-token step with static-size cache [B, T, hsz]; slot 0 holds
        the latent kv, token i sits at slot i+1."""
        q, k, v = self.qkv(x)  # [B,1,hsz]
        k_cache = jax.lax.dynamic_update_slice_in_dim(k_cache, k, pos + 1, axis=1)
        v_cache = jax.lax.dynamic_update_slice_in_dim(v_cache, v, pos + 1, axis=1)
        t = k_cache.shape[1]
        keep = (jnp.arange(t) <= pos + 1)[None, None, None, :]
        a = scaled_dot_product_attention(
            self._split(q), self._split(k_cache), self._split(v_cache),
            mask=keep, scale=(self.hsz // self.heads) ** -0.5)
        return self.finish(x, a.reshape(x.shape)), k_cache, v_cache


@register("optimus_gpt2_connector")
class OptimusGPT2Connector(nn.Module):
    """GPT-2 LM with latent memory + embedding injection
    (ref optimus_gpt2.py:813-1121; lm_head tied to wte)."""
    config: Mapping[str, Any] = None
    dtype: Dtype = jnp.float32

    def setup(self):
        c = dict(self.config)
        self.cfgd = c
        self.n_layer = c["n_layer"]
        hsz = c["n_embd"]
        self.wte = nn.Embed(c["vocab_size"], hsz, dtype=self.dtype,
                            name="transformer.wte")
        self.wpe = nn.Embed(c["n_positions"], hsz, dtype=self.dtype,
                            name="transformer.wpe")
        self.blocks = [GPT2Block(c, self.dtype, name=f"transformer.h.{i}")
                       for i in range(self.n_layer)]
        self.ln_f = nn.LayerNorm(epsilon=float(c.get("layer_norm_epsilon", 1e-5)),
                                 dtype=jnp.float32, name="transformer.ln_f")
        self.latent_mem = dense(hsz * self.n_layer, "transformer.linear",
                                self.dtype, use_bias=False)
        self.latent_emb = dense(hsz, "transformer.linear_emb", self.dtype,
                                use_bias=False)

    def _logits(self, h):
        # lm_head tied to wte (ref optimus_gpt2.py:659-664)
        emb = self.wte.embedding.astype(self.dtype)
        return h @ emb.T

    def _latents(self, z):
        mem = self.latent_mem(z)  # [B, hsz*L]
        mems = jnp.split(mem, self.n_layer, axis=-1)
        return [m[:, None, :] for m in mems], self.latent_emb(z)

    def __call__(self, input_ids, z):
        """Teacher-forced forward: logits [B, N, V]. Token i has position
        i+1 (past_length=1 from the latent memory, ref :893,899-901)."""
        b, n = input_ids.shape
        mems, emb_off = self._latents(z)
        pos = jnp.arange(1, n + 1)[None]
        h = self.wte(input_ids) + self.wpe(pos) + emb_off[:, None, :]
        # causal over tokens; latent slot (kv index 0) always visible
        causal = jnp.tril(jnp.ones((n, n), bool))
        mask = jnp.concatenate([jnp.ones((n, 1), bool), causal], axis=1)[None, None]
        for blk in self.blocks:
            h = blk(h, mems.pop(0), mask)
        h = self.ln_f(h).astype(self.dtype)
        return self._logits(h)

    def generate(self, z, rng, max_length: int = MAX_DECODE_LEN,
                 temperature: float = 1.0, top_k: int = 0, top_p: float = 1.0,
                 eos_token: int = GPT2_EOS, bos_token: int = GPT2_BOS):
        """Batched sampling loop as one lax.scan (ref optimus.py:662-688).

        Returns token ids [B, max_length] starting with BOS; positions after
        the first EOS are filled with EOS.

        ``rng`` is either ONE key (the reference semantics: a single
        batch-shaped categorical draw per step — row i's noise then depends
        on the batch composition) or a [B, 2] stack of PER-ROW keys: each
        row samples from its own key stream, so a row's text is independent
        of its co-riders — what lets the serving queue batch text decodes
        (serving/queue.py) instead of running one request at a time.
        """
        b = z.shape[0]
        per_row = getattr(rng, "ndim", 1) == 2
        hsz = self.cfgd["n_embd"]
        mems, emb_off = self._latents(z)
        k0 = jnp.zeros((self.n_layer, b, max_length + 1, hsz), self.dtype)
        v0 = jnp.zeros((self.n_layer, b, max_length + 1, hsz), self.dtype)
        for i in range(self.n_layer):
            k0 = k0.at[i, :, 0:1].set(mems[i].astype(self.dtype))
            v0 = v0.at[i, :, 0:1].set(mems[i].astype(self.dtype))

        def embed(tok, pos):
            return self.wte(tok[:, None]) + self.wpe(pos[None, None] + 1) \
                + emb_off[:, None, :]

        def step(carry, i):
            tok, kc, vc, done, rng = carry
            h = embed(tok, i)
            kcs, vcs = [], []
            for li, blk in enumerate(self.blocks):
                h, knew, vnew = blk.decode_step(h, kc[li], vc[li], i)
                kcs.append(knew)
                vcs.append(vnew)
            kc, vc = jnp.stack(kcs), jnp.stack(vcs)
            logits = self._logits(self.ln_f(h).astype(self.dtype))[:, 0]
            logits = logits / temperature
            logits = top_k_top_p_filter(logits, top_k, top_p)
            if per_row:
                ks = jax.vmap(jax.random.split)(rng)  # [B, 2, 2]
                rng, sub = ks[:, 0], ks[:, 1]
                nxt = jax.vmap(
                    lambda k, l: jax.random.categorical(
                        k, l.astype(jnp.float32)))(sub, logits)
            else:
                rng, sub = jax.random.split(rng)
                nxt = jax.random.categorical(sub, logits.astype(jnp.float32),
                                             axis=-1)
            # force EOS at the length cap (ref optimus.py:685-687)
            nxt = jnp.where(i >= max_length - 2, eos_token, nxt)
            nxt = jnp.where(done, eos_token, nxt)
            done = done | (nxt == eos_token)
            return (nxt, kc, vc, done, rng), nxt

        tok0 = jnp.full((b,), bos_token, jnp.int32)
        done0 = jnp.zeros((b,), bool)
        (_, _, _, _, _), toks = jax.lax.scan(
            step, (tok0, k0, v0, done0, rng), jnp.arange(max_length - 1))
        toks = jnp.concatenate([tok0[None], toks], axis=0).T  # [B, max_length]
        return toks


def top_k_top_p_filter(logits, top_k: int = 0, top_p: float = 0.0,
                       filter_value: float = -1e10):
    """Vectorized top-k / nucleus filtering (ref optimus.py:690-718).

    Note top_p == 1.0 keeps the full distribution (the VD serving default)."""
    if top_k > 0:
        kth = jnp.sort(logits, axis=-1)[:, -top_k][:, None]
        logits = jnp.where(logits < kth, filter_value, logits)
    if 0.0 < top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        cum = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
        # keep the first token above the threshold (shift right)
        keep_sorted = jnp.concatenate(
            [jnp.ones_like(cum[:, :1], bool), cum[:, :-1] <= top_p], axis=-1)
        kth = jnp.min(jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1,
                      keepdims=True)
        logits = jnp.where(logits < kth, filter_value, logits)
    return logits


# --------------------------------------------------------------------------
# The VAE wrapper
# --------------------------------------------------------------------------

@dataclasses.dataclass
class OptimusVAE:
    """Plain orchestrator over the two towers (ref optimus.py:16-120,724-763)."""
    encoder: OptimusBertConnector
    decoder: OptimusGPT2Connector
    tokenizer_encoder: Any = None   # BERT wordpiece tokenizer (callable)
    tokenizer_decoder: Any = None   # GPT-2 BPE tokenizer (detokenize)
    latent_size: int = 768
    bos_id: int = GPT2_BOS
    eos_id: int = GPT2_EOS
    _encode_jit: Any = None
    _decode_jit: Any = None

    def init_params(self, rng):
        k1, k2 = jax.random.split(jax.random.PRNGKey(0) if rng is None else rng)
        ids = jnp.zeros((1, 8), jnp.int32)
        enc = self.encoder.init(k1, ids)["params"]
        dec = self.decoder.init(k2, ids, jnp.zeros((1, self.latent_size)))["params"]
        return {"encoder": enc, "decoder": dec}

    def load_torch(self, state_dict, params_container, prefix: str = "vae.text.",
                   strict: bool = False) -> list[str]:
        from vdtpu.interop.torch_convert import torch_to_flax
        # GPT-2 Conv1D stores (in, out); pre-transpose to the torch Linear
        # convention the generic converter expects.
        conv1d = (".attn.c_attn.weight", ".attn.c_proj.weight",
                  ".mlp.c_fc.weight", ".mlp.c_proj.weight")
        sd = {}
        for k, val in state_dict.items():
            if k.endswith(conv1d) and hasattr(val, "t"):
                val = val.t().contiguous()
            elif k.endswith(conv1d):
                val = np.asarray(val).T
            sd[k] = val
        params = params_container["text"] if "text" in params_container else params_container
        params["encoder"], m1 = torch_to_flax(
            sd, params["encoder"], prefix=prefix + "encoder.", strict=strict)
        params["decoder"], m2 = torch_to_flax(
            sd, params["decoder"], prefix=prefix + "decoder.", strict=strict)
        return list(m1) + list(m2)

    # ---- the two public ops (ref optimus.py:729-763) ----

    def encode_ids(self, params, input_ids):
        if self._encode_jit is None:
            object.__setattr__(self, "_encode_jit", jax.jit(
                lambda p, ids: self.encoder.apply({"params": p}, ids)))
        mu_logvar = self._encode_jit(params["encoder"], jnp.asarray(input_ids))
        mu, _logvar = jnp.split(mu_logvar, 2, axis=-1)
        return mu  # inference uses the posterior mean (optimus.py:741-743)

    def encode(self, params, texts: Sequence[str], max_length: int = 77):
        if self.tokenizer_encoder is None:
            raise RuntimeError("BERT tokenizer not configured")
        ids = self.tokenizer_encoder(
            [t.lower() for t in texts], max_length=max_length)
        return self.encode_ids(params, ids)

    def decode_ids(self, params, z, rng, temperature: float = 1.0):
        # jit-cached: un-jitted apply re-traces the 30-step scan every call
        # (~3.7s of host tracing vs ~60ms on device)
        if self._decode_jit is None:
            def _decode(p, z, rng, temp):
                return self.decoder.apply(
                    {"params": p}, z, rng, temperature=temp,
                    eos_token=self.eos_id, bos_token=self.bos_id,
                    method=OptimusGPT2Connector.generate)
            object.__setattr__(self, "_decode_jit", jax.jit(_decode))
        return self._decode_jit(params["decoder"], jnp.asarray(z), rng,
                                jnp.asarray(temperature, jnp.float32))

    def decode(self, params, z, temperature: float = 1.0, rng=None) -> list[str]:
        rng = jax.random.PRNGKey(0) if rng is None else rng
        toks = np.asarray(self.decode_ids(params, z, rng, temperature))
        outs = []
        for row in toks:
            ids = []
            for t in row[1:]:  # skip BOS
                if t == self.eos_id:
                    break
                ids.append(int(t))
            if self.tokenizer_decoder is None:
                outs.append(" ".join(map(str, ids)))
            else:
                outs.append(self.tokenizer_decoder.decode(ids))
        return outs


@register("optimus_vae_next")
def build_optimus(encoder=None, decoder=None, tokenizer_encoder=None,
                  tokenizer_decoder=None, args=None, dtype=jnp.float32, **kw):
    from vdtpu.config.registry import build as _build
    enc = _build(encoder, dtype=dtype)
    dec = _build(decoder, dtype=dtype)
    tok_e = tok_d = None
    if tokenizer_encoder is not None:
        try:
            tok_e = _build(tokenizer_encoder)
        except (KeyError, FileNotFoundError):
            tok_e = None  # vocab files are user-supplied at runtime
    if tokenizer_decoder is not None:
        try:
            tok_d = _build(tokenizer_decoder)
        except (KeyError, FileNotFoundError):
            tok_d = None
    latent = (args or {}).get("latent_size", 768)
    vocab = (decoder.get("args", decoder).get("config", {}) or {}).get("vocab_size", 50260)
    bos, eos = (GPT2_BOS, GPT2_EOS) if vocab > GPT2_EOS else (vocab - 2, vocab - 1)
    return OptimusVAE(enc, dec, tok_e, tok_d, latent_size=latent,
                      bos_id=bos, eos_id=eos)


@register("optimus_bert_tokenizer")
def build_bert_tokenizer(vocab_file: str, do_lower_case: bool = False, **kw):
    from vdtpu.data.tokenizers import BertWordPieceTokenizer
    return BertWordPieceTokenizer(vocab_file, do_lower_case=do_lower_case)


@register("optimus_gpt2_tokenizer")
def build_gpt2_tokenizer(vocab_file: str, merges_file: str, **kw):
    from vdtpu.data.tokenizers import GPT2BPETokenizer
    return GPT2BPETokenizer(vocab_file, merges_file)
