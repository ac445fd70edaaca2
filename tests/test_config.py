from vdtpu.config.bank import ConfigBank, model_cfg_bank


def test_inheritance_and_parts_override():
    bank = model_cfg_bank()
    base = bank("openai_unet_2d_v1")
    dc = bank("openai_unet_2d_v1_dc")
    assert base["args"]["parts"] == ["global", "data", "context"]
    assert dc["args"]["parts"] == ["data", "context"]
    # args dict-update semantics: everything else inherited
    assert dc["args"]["model_channels"] == 320
    assert dc["args"]["channel_mult"] == [1, 2, 4, 4]
    assert dc["type"] == "openai_unet_2d_next"


def test_model_macro_resolution():
    bank = model_cfg_bank()
    vd = bank("vd_four_flow_v1-0")
    assert vd["type"] == "vd_v2_0"
    vaes = dict((k, v) for k, v in vd["args"]["vae_cfg_list"])
    assert vaes["image"]["type"] == "autoencoderkl"
    assert vaes["image"]["args"]["ddconfig"]["z_channels"] == 4
    assert vaes["text"]["type"] == "optimus_vae_next"
    # nested MODEL() inside optimus_v1
    assert vaes["text"]["args"]["encoder"]["type"] == "optimus_bert_connector"
    diffusers = dict((k, v) for k, v in vd["args"]["diffuser_cfg_list"])
    assert diffusers["text"]["args"]["parts"] == ["data", "context"]
    assert vd["args"]["latent_scale_factor"]["image"] == 0.18215


def test_same_and_search_macros(tmp_path):
    d = tmp_path / "cfgs"
    d.mkdir()
    (d / "a.yaml").write_text(
        """
root:
  type: t
  args:
    alpha: 3
    beta: SAME(args.alpha)
    nested:
      deep_val: 7
    gamma: SEARCH(deep_val)
child:
  super_cfg: root
  delete_args: [gamma]
  args:
    alpha: 5
"""
    )
    bank = ConfigBank(config_dir=str(d))
    root = bank("root")
    assert root["args"]["beta"] == 3
    assert root["args"]["gamma"] == 7
    child = bank("child")
    assert child["args"]["alpha"] == 5
    assert "gamma" not in child["args"]
    # SAME re-resolves against the merged cfg
    assert child["args"]["beta"] == 5
