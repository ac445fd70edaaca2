"""Gradio WebUI: the L4 application layer.

Capability parity with `/root/reference/app.py:1051-1113` — all seven tabs
(Text-to-Image, Image-Variation, Image-to-Text, Text-Variation, Dual-/
Triple-/Multi-Context), per-context mask drawing (the reference's ImageMask
blocks, `cusomized_gradio_blocks.py`), and seeded `gr.Examples` with cached
outputs (the reference's de-facto golden tests, app.py:603-610,942-1007).

Gradio is an optional dependency (not bundled in TPU serving images);
`build_app` raises a clear error when it's absent, and `vdtpu.serving.cli`
covers the same flows headlessly. The tab handlers live in `make_handlers`
so they are testable without gradio.
"""
from __future__ import annotations

import os

import numpy as np

from vdtpu.serving.api import VDInference

_INSTRUCTIONS = {
    "Text-to-Image": "Generate image from text prompt.",
    "Image-Variation": "Generate image conditioned on reference image.",
    "Image-to-Text": "Generate text from reference image.",
    "Text-Variation": "Generate text from reference text prompt.",
    "Dual-Context": "Generate image conditioned on both text and image.",
    "Triple-Context": "Generate image conditioned on text and up to two "
                      "(maskable) images.",
    "Multi-Context": "Generate image from multiple (masked, weighted) contexts.",
}


def get_instruction(mode: str) -> str:
    return _INSTRUCTIONS[mode]


def get_example(mode: str, assets_dir: str | None = None):
    """Pinned input+seed example rows per tab (ref get_example,
    app.py:942-1007). Text-only tabs always have examples; image tabs get
    them when an assets directory is supplied."""
    if mode == "Text-to-Image":
        return [
            ["a dream of a village in china, by Caspar David Friedrich, "
             "matte painting trending on artstation HQ", 23],
            ["a beautiful landscape with mountains and rivers", 20],
        ]
    if mode == "Text-Variation":
        return [["heavy arms gundam penguin mech", 20]]
    if assets_dir is None:
        return []
    a = lambda name: os.path.join(assets_dir, name)
    if mode == "Image-Variation":
        return [[a("ghibli.jpg"), 0.0, 0.5, False, 20],
                [a("matisse.jpg"), 0.0, 1.0, True, 20]]
    if mode == "Image-to-Text":
        return [[a("house_by_lake.jpg"), 20]]
    if mode == "Dual-Context":
        return [[a("benz.jpg"), 0.5, "cyberpunk 2077", 0.7, 22]]
    if mode == "Triple-Context":
        return [[a("night_light.jpg"), None, 1.0, 0.5, False,
                 a("paris.jpg"), None, 0.94, 0.5, False,
                 "snow on the street", 0.4, 28]]
    if mode == "Multi-Context":
        return [[a("e0i0.jpg"), None, 1.0, 0.5, False,
                 a("e0i1.jpg"), None, 1.0, 0.5, False,
                 None, None, 1.0, 0.5, False,
                 None, None, 1.0, 0.5, False,
                 "", 0.0, 20]]
    return []


def _to_batch(pil_image, size=None):
    """PIL (or array) -> [1,H,W,3] float batch, bicubic-resized to
    ``size`` = (H, W) when given — input regularization parity with the
    reference, which resizes every upload to output_dim before ToTensor
    (app.py:329-330). Array inputs resize through the API helper."""
    if size is not None:
        from PIL import Image
        h, w = int(size[0]), int(size[1])
        if isinstance(pil_image, Image.Image) and pil_image.size != (w, h):
            pil_image = pil_image.resize((w, h), resample=Image.Resampling.BICUBIC)
    arr = np.asarray(pil_image, np.float32)[None] / 255.0
    if size is not None and arr.shape[1:3] != (int(size[0]), int(size[1])):
        from vdtpu.serving.api import regularize_image
        arr = np.asarray(regularize_image(arr, size))
    return arr


def _to_pil(batch):
    from PIL import Image
    return [Image.fromarray((np.asarray(b) * 255).astype(np.uint8)) for b in batch]


def _mask_batch(mask_img):
    """Sketch-pad output -> [1, H, W, 1] float mask (white strokes = keep).

    Accepts a PIL image, an {"image", "mask"} dict (gradio sketch tool), or
    None."""
    if mask_img is None:
        return None
    if isinstance(mask_img, dict):
        mask_img = mask_img.get("mask") or mask_img.get("image")
        if mask_img is None:
            return None
    m = np.asarray(mask_img, np.float32)
    if m.ndim == 3:
        m = m[..., :3].mean(-1)
    m = (m / max(m.max(), 1e-6))[None, ..., None]
    return m


def _image_ctx(im, mask, strength, fcs, use_mask, size=None):
    if im is None:
        return None
    ctx = {"image": _to_batch(im, size), "strength": float(strength),
           "fcs_lvl": float(fcs)}
    if use_mask:
        mb = _mask_batch(mask)
        if mb is not None:
            ctx["mask"] = mb
    return ctx


def make_handlers(vdi: VDInference):
    """Tab callbacks (pure of gradio; unit-testable). Uploaded images are
    bicubic-resized to vdi.output_dim at ingestion (reference parity:
    app.py:329-330); VDInference regularizes again idempotently."""
    dim = vdi.output_dim

    def t2i(text, seed):
        return _to_pil(vdi.inference_t2i(text, int(seed)))

    def i2i(im, fid, fcs, clr, seed):
        return _to_pil(vdi.inference_i2i(_to_batch(im, dim), fid, fcs,
                                         "Simple" if clr else None, int(seed)))

    def i2t(im, seed):
        return "\n".join(vdi.inference_i2t(_to_batch(im, dim), int(seed)))

    def t2t(text, seed):
        return "\n".join(vdi.inference_t2t(text, int(seed)))

    def dcg(im, fcs, text, strength, seed):
        return _to_pil(vdi.inference_dcg(_to_batch(im, dim), fcs, text,
                                         strength, int(seed)))

    def tcg(im1, m1, s1, f1, u1, im2, m2, s2, f2, u2, text, tstrength, seed):
        ctxs = [c for c in (_image_ctx(im1, m1, s1, f1, u1, dim),
                            _image_ctx(im2, m2, s2, f2, u2, dim)) if c]
        _, out = vdi.inference_tcg(ctxs, text or None, float(tstrength),
                                   int(seed))
        return _to_pil(out)

    def mcg(text, tstrength, seed, *rows):
        ctxs = []
        for i in range(0, len(rows), 5):
            c = _image_ctx(*rows[i:i + 5], size=dim)
            if c:
                ctxs.append(c)
        _, out = vdi.inference_mcg(ctxs, text or None, float(tstrength),
                                   int(seed))
        return _to_pil(out)

    return {"t2i": t2i, "i2i": i2i, "i2t": i2t, "t2t": t2t, "dcg": dcg,
            "tcg": tcg, "mcg": mcg}


def _maybe_examples(gr, mode, inputs, fn, outputs, assets_dir,
                    cache_examples):
    rows = get_example(mode, assets_dir)
    if rows:
        gr.Examples(examples=rows, inputs=inputs, fn=fn, outputs=outputs,
                    cache_examples=cache_examples)


def _image_ctx_row(gr, i):
    with gr.Row():
        im = gr.Image(type="pil", label=f"Context {i + 1}")
        mask = gr.Image(type="pil", label="Mask (draw)",
                        **(_sketch_kwargs(gr)))
    with gr.Row():
        st = gr.Slider(0, 2, value=1.0, label="Strength")
        fc = gr.Slider(0, 1, value=0.5, label="Focus")
        um = gr.Checkbox(label="Use mask")
    return [im, mask, st, fc, um]


def _sketch_kwargs(gr):
    # gradio 3.x sketch tool; newer gradios draw masks via ImageEditor
    import inspect
    if "tool" in inspect.signature(gr.Image.__init__).parameters:
        return {"tool": "sketch"}
    return {}


def build_app(vdi: VDInference, assets_dir: str | None = None,
              cache_examples: bool = True):
    try:
        import gradio as gr
    except ImportError as e:
        raise RuntimeError(
            "gradio is not installed; use vdtpu.serving.cli for headless "
            "inference or install gradio for the WebUI") from e

    h = make_handlers(vdi)

    with gr.Blocks() as app:
        gr.Markdown("# Versatile Diffusion (TPU)")
        with gr.Tab("Text-to-Image"):
            gr.Markdown(get_instruction("Text-to-Image"))
            txt = gr.Textbox(label="Prompt")
            seed = gr.Number(value=0, label="Seed", precision=0)
            out = gr.Gallery()
            gr.Button("Run").click(h["t2i"], [txt, seed], out)
            _maybe_examples(gr, "Text-to-Image", [txt, seed], h["t2i"], out,
                            assets_dir, cache_examples)
        with gr.Tab("Image-Variation"):
            gr.Markdown(get_instruction("Image-Variation"))
            im = gr.Image(type="pil")
            fid = gr.Slider(0, 1, value=0.5, label="Fidelity")
            fcs = gr.Slider(0, 1, value=0.5, label="Focus (semantic-style)")
            clr = gr.Checkbox(label="Color adjust")
            seed = gr.Number(value=0, label="Seed", precision=0)
            out = gr.Gallery()
            gr.Button("Run").click(h["i2i"], [im, fid, fcs, clr, seed], out)
            _maybe_examples(gr, "Image-Variation", [im, fid, fcs, clr, seed],
                            h["i2i"], out, assets_dir, cache_examples)
        with gr.Tab("Image-to-Text"):
            gr.Markdown(get_instruction("Image-to-Text"))
            im = gr.Image(type="pil")
            seed = gr.Number(value=0, label="Seed", precision=0)
            out = gr.Textbox()
            gr.Button("Run").click(h["i2t"], [im, seed], out)
            _maybe_examples(gr, "Image-to-Text", [im, seed], h["i2t"], out,
                            assets_dir, cache_examples)
        with gr.Tab("Text-Variation"):
            gr.Markdown(get_instruction("Text-Variation"))
            txt = gr.Textbox(label="Prompt")
            seed = gr.Number(value=0, label="Seed", precision=0)
            out = gr.Textbox()
            gr.Button("Run").click(h["t2t"], [txt, seed], out)
            _maybe_examples(gr, "Text-Variation", [txt, seed], h["t2t"], out,
                            assets_dir, cache_examples)
        with gr.Tab("Dual-Context"):
            gr.Markdown(get_instruction("Dual-Context"))
            im = gr.Image(type="pil")
            fcs = gr.Slider(0, 1, value=0.5, label="Focus")
            txt = gr.Textbox(label="Text context")
            st = gr.Slider(0, 1, value=0.5, label="Text strength")
            seed = gr.Number(value=0, label="Seed", precision=0)
            out = gr.Gallery()
            gr.Button("Run").click(h["dcg"], [im, fcs, txt, st, seed], out)
            _maybe_examples(gr, "Dual-Context", [im, fcs, txt, st, seed],
                            h["dcg"], out, assets_dir, cache_examples)
        with gr.Tab("Triple-Context"):
            gr.Markdown(get_instruction("Triple-Context"))
            comps = []
            for i in range(2):
                comps += _image_ctx_row(gr, i)
            txt = gr.Textbox(label="Text context")
            st = gr.Slider(0, 1, value=0.0, label="Text strength")
            seed = gr.Number(value=0, label="Seed", precision=0)
            out = gr.Gallery()
            gr.Button("Run").click(h["tcg"], [*comps, txt, st, seed], out)
            _maybe_examples(gr, "Triple-Context", [*comps, txt, st, seed],
                            h["tcg"], out, assets_dir, cache_examples)
        with gr.Tab("Multi-Context"):
            gr.Markdown(get_instruction("Multi-Context"))
            comps = []
            for i in range(4):
                comps += _image_ctx_row(gr, i)
            txt = gr.Textbox(label="Text context")
            st = gr.Slider(0, 1, value=0.0, label="Text strength")
            seed = gr.Number(value=0, label="Seed", precision=0)
            out = gr.Gallery()
            gr.Button("Run").click(h["mcg"], [txt, st, seed, *comps], out)
            _maybe_examples(gr, "Multi-Context",
                            [*comps, txt, st, seed], h["mcg"], out,
                            assets_dir, cache_examples)
    return app
