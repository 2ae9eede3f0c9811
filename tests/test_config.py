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
