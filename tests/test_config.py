"""Config: defaults + reference-format (OpenCV FileStorage) YAML loading."""

import textwrap

from sdslam_tpu.utils.config import SystemConfig, load_config


def test_defaults():
    cfg = SystemConfig()
    assert cfg.orb.n_levels == 5
    assert cfg.orb.scale_factor == 2.0
    assert cfg.map.covis_min_weight == 15


def test_load_reference_style_yaml(tmp_path):
    y = tmp_path / "cfg.yaml"
    y.write_text(
        textwrap.dedent(
            """\
            %YAML:1.0
            Camera.fx: 517.306408
            Camera.fy: 516.469215
            Camera.cx: 318.643040
            Camera.cy: 255.313989
            Camera.k1: 0.262383
            Camera.k2: -0.953104
            Camera.p1: -0.005358
            Camera.p2: 0.002628
            Camera.k3: 1.163314
            Camera.Width: 640
            Camera.Height: 480
            Camera.fps: 30.0
            Camera.bf: 40.0
            ORBextractor.nFeatures: 1250
            ORBextractor.scaleFactor: 2.0
            ORBextractor.nLevels: 5
            ORBextractor.thresholdFAST: 20
            ThDepth: 40.0
            DepthMapFactor: 5000.0
            UsePattern: 0
            """
        )
    )
    cfg = load_config(str(y))
    assert abs(cfg.camera.fx - 517.306408) < 1e-6
    assert cfg.camera.width == 640
    assert cfg.orb.n_features == 1250
    assert cfg.tracking.depth_map_factor == 5000.0
    assert cfg.tracking.max_frames == 30


def test_missing_keys_use_defaults(tmp_path):
    y = tmp_path / "min.yaml"
    y.write_text("%YAML:1.0\nCamera.fx: 500.0\n")
    cfg = load_config(str(y))
    assert cfg.camera.fx == 500.0
    assert cfg.orb.n_features == 1000


def test_shipped_dataset_configs_load():
    """Every shipped per-dataset config (the reference's Examples/ YAML set:
    TUM1/2/3, EuRoC, TUMVO + Example) parses through the compat loader with
    its calibration intact."""
    import os

    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    expect_fx = {
        "Example.yaml": None,  # documented defaults file; just parse
        "TUM1.yaml": 517.306408,
        "TUM2.yaml": 520.908620,
        "TUM3.yaml": 535.4,
        "EuRoC.yaml": 458.654,
        "TUMVO.yaml": 277.524,
    }
    names = sorted(os.listdir(root))
    assert set(expect_fx) <= set(names)
    for name in names:
        if not name.endswith(".yaml"):
            continue
        cfg = load_config(os.path.join(root, name))
        fx = expect_fx.get(name)
        if fx is not None:
            assert abs(cfg.camera.fx - fx) < 1e-6, name
    # dataset-specific values survive the round trip
    cfg2 = load_config(os.path.join(root, "TUM2.yaml"))
    assert cfg2.tracking.depth_map_factor == 5208.0
    eur = load_config(os.path.join(root, "EuRoC.yaml"))
    assert eur.camera.width == 752 and eur.camera.bf == 0.0
