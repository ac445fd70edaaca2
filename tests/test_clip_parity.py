"""CLIP context-encoder parity vs a random-init HF CLIPModel (no downloads),
replaying the VD encode formulas from /root/reference/lib/model_zoo/clip.py."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
tfm = pytest.importorskip("transformers")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vdtpu.interop.torch_convert import torch_to_flax  # noqa: E402
from vdtpu.models import clip as vclip  # noqa: E402

# eos_token_id=127 (= the max id we use): modern HF pools at the first EOS
# token while transformers 4.24 (the reference pin) used argmax(input_ids);
# with EOT = highest id both coincide, which is what VD relies on.
TEXT_CFG = dict(vocab_size=128, hidden_size=32, intermediate_size=64,
                num_hidden_layers=2, num_attention_heads=4,
                max_position_embeddings=16, eos_token_id=127)
VIS_CFG = dict(hidden_size=40, intermediate_size=80, num_hidden_layers=2,
               num_attention_heads=4, image_size=28, patch_size=14)


@pytest.fixture(scope="module")
def hf_model():
    cfg = tfm.CLIPConfig(
        text_config=TEXT_CFG, vision_config=VIS_CFG, projection_dim=24)
    torch.manual_seed(0)
    return tfm.CLIPModel(cfg).eval()


def small_towers():
    tcfg = vclip.CLIPTowerConfig(hidden=32, layers=2, heads=4, intermediate=64)
    vcfg = vclip.CLIPTowerConfig(hidden=40, layers=2, heads=4, intermediate=80)
    return tcfg, vcfg


class SmallText(vclip.CLIPTextContextEncoder):
    def setup(self):
        tcfg, _ = small_towers()
        self.text_model = vclip.CLIPTextTower(
            cfg=tcfg, vocab_size=128, max_len=16, name="text_model")
        self.text_projection = vclip.dense(24, "text_projection", jnp.float32,
                                           use_bias=False)


class SmallImage(vclip.CLIPImageContextEncoder):
    def setup(self):
        import flax.linen as nn
        _, vcfg = small_towers()
        self.vision_model = vclip.CLIPVisionTower(
            cfg=vcfg, image_size=28, patch=14, name="vision_model")
        self.post_layernorm = nn.LayerNorm(
            epsilon=1e-5, dtype=jnp.float32, name="vision_model.post_layernorm")
        self.visual_projection = vclip.dense(24, "visual_projection", jnp.float32,
                                             use_bias=False)


def test_text_context_encode_parity(hf_model):
    ids = np.array([[5, 9, 127, 3, 0, 0, 0, 0],
                    [7, 127, 1, 1, 1, 1, 1, 1]], dtype=np.int32)
    with torch.no_grad():
        out = hf_model.text_model(input_ids=torch.tensor(ids, dtype=torch.long))
        z_t = hf_model.text_projection(out.last_hidden_state)
        zp = hf_model.text_projection(out.pooler_output)
        ref = (z_t / torch.norm(zp.unsqueeze(1), dim=-1, keepdim=True)).numpy()

    ours = SmallText()
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(ids))["params"]
    sd = {}
    for k, v in hf_model.state_dict().items():
        if k.startswith("text_model.") or k == "text_projection.weight":
            sd[k] = v
    params, _ = torch_to_flax(sd, params)
    z = np.asarray(ours.apply({"params": params}, jnp.asarray(ids)))
    np.testing.assert_allclose(z, ref, atol=3e-5, rtol=1e-4)


def test_image_context_encode_parity(hf_model):
    px = np.random.RandomState(0).randn(2, 3, 28, 28).astype(np.float32)
    with torch.no_grad():
        out = hf_model.vision_model(pixel_values=torch.tensor(px))
        z = hf_model.vision_model.post_layernorm(out.last_hidden_state)
        z = hf_model.visual_projection(z)
        ref = (z / torch.norm(z[:, 0:1], dim=-1, keepdim=True)).numpy()

    ours = SmallImage()
    px_j = jnp.asarray(px.transpose(0, 2, 3, 1))
    params = ours.init(jax.random.PRNGKey(0), px_j)["params"]
    sd = {k: v for k, v in hf_model.state_dict().items()
          if k.startswith("vision_model.") or k == "visual_projection.weight"}
    params, _ = torch_to_flax(sd, params)
    z = np.asarray(ours.apply({"params": params}, px_j))
    np.testing.assert_allclose(z, ref, atol=3e-5, rtol=1e-4)


def test_masked_image_encode_matches_reference_formula(hf_model):
    """Mask path: token mask scales embeddings and final z (clip.py:103-143)."""
    px = np.random.RandomState(1).randn(1, 3, 28, 28).astype(np.float32)
    mask = np.zeros((1, 28, 28, 1), np.float32)
    mask[:, :14, :, :] = 1.0

    tm = vclip.vision_token_mask(jnp.asarray(mask), patch=14)
    assert tm.shape == (1, 5, 1)  # CLS + 2x2 patches
    np.testing.assert_allclose(np.asarray(tm[0, 0, 0]), 0.5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(tm[0, 1:, 0]), [1, 1, 0, 0], atol=1e-6)

    # torch oracle: scale embeddings after position add, then VD encode, then
    # scale z; replicated with hooks on the HF model.
    emb_mod = hf_model.vision_model.embeddings
    with torch.no_grad():
        pv = torch.tensor(px)
        patch = emb_mod.patch_embedding(pv).flatten(2).transpose(1, 2)
        cls = emb_mod.class_embedding.expand(1, 1, -1)
        e = torch.cat([cls, patch], dim=1) + emb_mod.position_embedding(emb_mod.position_ids)
        e = e * torch.tensor(np.asarray(tm))
        enc = hf_model.vision_model.encoder(inputs_embeds=hf_model.vision_model.pre_layrnorm(e))
        z = hf_model.vision_model.post_layernorm(enc.last_hidden_state)
        z = hf_model.visual_projection(z)
        z = z / torch.norm(z[:, 0:1], dim=-1, keepdim=True)
        ref = (z * torch.tensor(np.asarray(tm))).numpy()

    ours = SmallImage()
    px_j = jnp.asarray(px.transpose(0, 2, 3, 1))
    params = ours.init(jax.random.PRNGKey(0), px_j)["params"]
    sd = {k: v for k, v in hf_model.state_dict().items()
          if k.startswith("vision_model.") or k == "visual_projection.weight"}
    params, _ = torch_to_flax(sd, params)
    z = np.asarray(ours.apply({"params": params}, px_j, tm))
    np.testing.assert_allclose(z, ref, atol=3e-5, rtol=1e-4)
