import textwrap

from ptt_tpu.config import ConfigDict, cfg_from_list, cfg_from_yaml_file


def test_reference_yaml_parses():
    cfg = cfg_from_yaml_file("tools/cfgs/kitti_models/ptt.yaml")
    assert cfg.CLASS_NAMES == "Car"
    assert cfg.MODEL.NAME == "PTT"
    assert cfg.MODEL.BACKBONE_3D.SA_CONFIG.NPOINTS_SEARCH == [512, 256, 128]
    assert cfg.MODEL.CENTROID_HEAD.TRANSFORMER_BLOCK.ENABLE is True
    assert cfg.OPTIMIZATION.BATCH_SIZE_PER_GPU == 48
    assert cfg.DATA_CONFIG.SEARCH_INPUT_SIZE == 1024


def test_attr_access_nested():
    c = ConfigDict({"A": {"B": {"C": 3}}, "L": [{"X": 1}]})
    assert c.A.B.C == 3
    assert c.L[0].X == 1
    c.A.B.C = 4
    assert c["A"]["B"]["C"] == 4


def test_base_config_inheritance(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text("FOO: 1\nBAR:\n  X: 2\n")
    child = tmp_path / "child.yaml"
    child.write_text(f"_BASE_CONFIG_: {base}\nBAR:\n  Y: 3\n")
    cfg = cfg_from_yaml_file(child)
    assert cfg.FOO == 1
    assert cfg.BAR.X == 2
    assert cfg.BAR.Y == 3


def test_cfg_from_list_overrides():
    cfg = ConfigDict({"OPT": {"LR": 0.001, "STEPS": [1, 2], "NAME": "adam"}})
    cfg_from_list(["OPT.LR", "0.01", "OPT.NAME", "sgd", "OPT.STEPS", "3,4,5"], cfg)
    assert cfg.OPT.LR == 0.01
    assert cfg.OPT.NAME == "sgd"
    assert cfg.OPT.STEPS == [3, 4, 5]


def test_cfg_pickles():
    import pickle

    c = ConfigDict({"A": {"B": 1}})
    c2 = pickle.loads(pickle.dumps(c))
    assert c2.A.B == 1


def test_nested_base_config_chain_deep_merges():
    """3-level _BASE_CONFIG_ chains must deep-merge: a child overriding two
    OPTIMIZATION keys keeps the grandparent's optimizer settings."""
    from ptt_tpu.config import cfg_from_yaml_file

    cfg = cfg_from_yaml_file("tools/cfgs/synthetic_models/p2b_synth.yaml")
    assert cfg.OPTIMIZATION.OPTIMIZER == "adam"          # grandparent (kitti/ptt)
    assert cfg.OPTIMIZATION.NUM_EPOCHS == 15             # child override
    assert cfg.MODEL.CENTROID_HEAD.TRANSFORMER_BLOCK.ENABLE is False
    assert cfg.MODEL.CENTROID_HEAD.CLS_FC.CHANNELS == [256, 256, 256, 1]
    assert cfg.DATA_CONFIG.DATASET == "SyntheticTrackingDataset"  # parent
    assert "_BASE_CONFIG_" not in cfg
