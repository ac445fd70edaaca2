"""Gradio WebUI: the L4 application layer.

Capability parity with `/root/reference/app.py:1051-1113` — seven tabs
(Text-to-Image, Image-Variation, Image-to-Text, Text-Variation,
Dual-/Triple-/Multi-Context) over a `VDInference` backend. Gradio is an
optional dependency (not bundled in TPU serving images); `build_app` raises
a clear error when it's absent, and `vdtpu.serving.cli` covers the same
flows headlessly.
"""
from __future__ import annotations

import numpy as np

from vdtpu.serving.api import VDInference

_INSTRUCTIONS = {
    "Text-to-Image": "Generate image from text prompt.",
    "Image-Variation": "Generate image conditioned on reference image.",
    "Image-to-Text": "Generate text from reference image.",
    "Text-Variation": "Generate text from reference text prompt.",
    "Dual-Context": "Generate image conditioned on both text and image.",
    "Triple-Context": "Generate image conditioned on text and up to two images.",
    "Multi-Context": "Generate image from multiple (masked, weighted) contexts.",
}


def get_instruction(mode: str) -> str:
    return _INSTRUCTIONS[mode]


def _to_batch(pil_image):
    return np.asarray(pil_image, np.float32)[None] / 255.0


def _to_pil(batch):
    from PIL import Image
    return [Image.fromarray((np.asarray(b) * 255).astype(np.uint8)) for b in batch]


def build_app(vdi: VDInference):
    try:
        import gradio as gr
    except ImportError as e:
        raise RuntimeError(
            "gradio is not installed; use vdtpu.serving.cli for headless "
            "inference or install gradio for the WebUI") from e

    def t2i(text, seed):
        return _to_pil(vdi.inference_t2i(text, int(seed)))

    def i2i(im, fid, fcs, clr, seed):
        return _to_pil(vdi.inference_i2i(_to_batch(im), fid, fcs,
                                         "Simple" if clr else None, int(seed)))

    def i2t(im, seed):
        return "\n".join(vdi.inference_i2t(_to_batch(im), int(seed)))

    def t2t(text, seed):
        return "\n".join(vdi.inference_t2t(text, int(seed)))

    def dcg(im, fcs, text, strength, seed):
        return _to_pil(vdi.inference_dcg(_to_batch(im), fcs, text, strength, int(seed)))

    def mcg(text, strength, seed, *imgs_and_opts):
        ctxs = []
        for i in range(0, len(imgs_and_opts), 3):
            im, st, fc = imgs_and_opts[i:i + 3]
            if im is None:
                continue
            ctxs.append({"image": _to_batch(im), "strength": st, "fcs_lvl": fc})
        _, out = vdi.inference_mcg(ctxs, text, strength, int(seed))
        return _to_pil(out)

    with gr.Blocks() as app:
        gr.Markdown("# Versatile Diffusion (TPU)")
        with gr.Tab("Text-to-Image"):
            gr.Markdown(get_instruction("Text-to-Image"))
            txt = gr.Textbox(label="Prompt")
            seed = gr.Number(value=0, label="Seed", precision=0)
            out = gr.Gallery()
            gr.Button("Run").click(t2i, [txt, seed], out)
        with gr.Tab("Image-Variation"):
            gr.Markdown(get_instruction("Image-Variation"))
            im = gr.Image(type="pil")
            fid = gr.Slider(0, 1, value=0.5, label="Fidelity")
            fcs = gr.Slider(0, 1, value=0.5, label="Focus (semantic-style)")
            clr = gr.Checkbox(label="Color adjust")
            seed = gr.Number(value=0, label="Seed", precision=0)
            out = gr.Gallery()
            gr.Button("Run").click(i2i, [im, fid, fcs, clr, seed], out)
        with gr.Tab("Image-to-Text"):
            gr.Markdown(get_instruction("Image-to-Text"))
            im = gr.Image(type="pil")
            seed = gr.Number(value=0, label="Seed", precision=0)
            out = gr.Textbox()
            gr.Button("Run").click(i2t, [im, seed], out)
        with gr.Tab("Text-Variation"):
            gr.Markdown(get_instruction("Text-Variation"))
            txt = gr.Textbox(label="Prompt")
            seed = gr.Number(value=0, label="Seed", precision=0)
            out = gr.Textbox()
            gr.Button("Run").click(t2t, [txt, seed], out)
        with gr.Tab("Dual-Context"):
            gr.Markdown(get_instruction("Dual-Context"))
            im = gr.Image(type="pil")
            fcs = gr.Slider(0, 1, value=0.5, label="Focus")
            txt = gr.Textbox(label="Text context")
            st = gr.Slider(0, 1, value=0.5, label="Text strength")
            seed = gr.Number(value=0, label="Seed", precision=0)
            out = gr.Gallery()
            gr.Button("Run").click(dcg, [im, fcs, txt, st, seed], out)
        with gr.Tab("Multi-Context"):
            gr.Markdown(get_instruction("Multi-Context"))
            comps = []
            for i in range(4):
                with gr.Row():
                    comps += [gr.Image(type="pil", label=f"Context {i + 1}"),
                              gr.Slider(0, 2, value=1.0, label="Strength"),
                              gr.Slider(0, 1, value=0.5, label="Focus")]
            txt = gr.Textbox(label="Text context")
            st = gr.Slider(0, 1, value=0.0, label="Text strength")
            seed = gr.Number(value=0, label="Seed", precision=0)
            out = gr.Gallery()
            gr.Button("Run").click(mcg, [txt, st, seed, *comps], out)
    return app
