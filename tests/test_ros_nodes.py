"""ROS transport shim: topic wiring, image decoding, odometry publishing.

Uses an injected rospy-compatible stub (no ROS install needed) and a fake
SLAM system, so this covers exactly the transport layer the reference's
ros_{monocular,rgbd,fusion}.cc nodes provide on top of the tracking core.
"""

import numpy as np

from sdslam_tpu.io import ros_nodes as rn


# -- rospy / sensor_msgs stubs -------------------------------------------


class _Stamp:
    def __init__(self, t):
        self._t = t

    def to_sec(self):
        return self._t


class _Header:
    def __init__(self, t):
        self.stamp = _Stamp(t)


class _ImageMsg:
    def __init__(self, t, arr, encoding):
        self.header = _Header(t)
        self.height, self.width = arr.shape[:2]
        self.encoding = encoding
        self.is_bigendian = False
        self.data = arr.tobytes()
        self.step = len(self.data) // self.height


class _Vec3:
    def __init__(self, x, y, z):
        self.x, self.y, self.z = x, y, z


class _ImuRosMsg:
    def __init__(self, t, w, a):
        self.header = _Header(t)
        self.angular_velocity = _Vec3(*w)
        self.linear_acceleration = _Vec3(*a)


class _FakePub:
    def __init__(self):
        self.msgs = []

    def publish(self, m):
        self.msgs.append(m)


class _FakeRospy:
    def __init__(self):
        self.subs = {}
        self.pubs = {}

    def Subscriber(self, topic, _type, cb, queue_size=10):
        self.subs[topic] = cb

    def Publisher(self, topic, _type, queue_size=10):
        p = _FakePub()
        self.pubs[topic] = p
        return p

    def spin(self):
        pass


class _FakeTrackerState:
    status = "OK"


class _FakeTracker:
    st = _FakeTrackerState()


class _FakeSystem:
    """Records track calls; returns a fixed non-trivial pose."""

    def __init__(self):
        self.tracker = _FakeTracker()
        self.calls = []
        self.Tcw = np.eye(4)
        self.Tcw[:3, 3] = [0.0, 0.0, 2.0]

    def track_rgbd(self, img, depth, ts):
        self.calls.append(("rgbd", ts, img.dtype, depth.dtype))
        return self.Tcw

    def track_monocular(self, img, ts):
        self.calls.append(("mono", ts))
        return self.Tcw

    def track_fusion(self, img, meas, ts):
        self.calls.append(("fusion", ts, tuple(np.round(meas, 3))))
        return self.Tcw


# -- image decoding -------------------------------------------------------


def test_decode_mono8_and_depth(rng):
    g = rng.integers(0, 255, (8, 6), dtype=np.uint8)
    assert np.array_equal(rn.decode_image(_ImageMsg(0, g, "mono8")), g)
    d16 = rng.integers(0, 5000, (8, 6)).astype(np.uint16)
    assert np.array_equal(rn.decode_image(_ImageMsg(0, d16, "16UC1")), d16)
    d32 = rng.random((8, 6)).astype(np.float32)
    assert np.allclose(rn.decode_image(_ImageMsg(0, d32, "32FC1")), d32)


def test_decode_rgb8_luma(rng):
    rgb = rng.integers(0, 255, (4, 5, 3), dtype=np.uint8)
    g = rn.decode_image(_ImageMsg(0, rgb, "rgb8"))
    ref = (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2])
    assert np.abs(g.astype(float) - ref).max() <= 1.0
    # bgr8 must agree after channel swap
    g2 = rn.decode_image(_ImageMsg(0, rgb[:, :, ::-1].copy(), "bgr8"))
    assert np.array_equal(g, g2)


# -- node wiring ----------------------------------------------------------


def test_rgbd_node_sync_and_odometry(rng):
    ros = _FakeRospy()
    sys_ = _FakeSystem()
    node = rn.RGBDNode(sys_, ros=ros).start()
    assert rn.ODOM_TOPIC in ros.pubs
    img_cb = ros.subs[rn.DEFAULT_CAMERA_TOPIC]
    dep_cb = ros.subs[rn.DEFAULT_DEPTH_TOPIC]

    g = rng.integers(0, 255, (8, 6), dtype=np.uint8)
    d = rng.integers(0, 5000, (8, 6)).astype(np.uint16)
    for k in range(3):
        t = 100.0 + k * 0.1
        img_cb(_ImageMsg(t, g, "mono8"))
        dep_cb(_ImageMsg(t + 0.004, d, "16UC1"))  # within the 20 ms slop

    assert len(sys_.calls) == 3
    assert all(c[0] == "rgbd" for c in sys_.calls)
    pub = ros.pubs[rn.ODOM_TOPIC]
    assert len(pub.msgs) == 3
    m = pub.msgs[0]
    # Twc = inv(Tcw): position = -R^T t = (0, 0, -2)
    assert np.allclose(m["position"], [0, 0, -2])
    assert m["stamp"] == 100.0 and m["tracked"]
    assert m["frame_id"] == "world" and m["child_frame_id"] == "camera"
    assert node.runner.odometry[0].stamp == 100.0


def test_fusion_node_attaches_imu():
    ros = _FakeRospy()
    sys_ = _FakeSystem()
    rn.FusionNode(sys_, ros=ros).start()
    ros.subs[rn.DEFAULT_IMU_TOPIC](
        _ImuRosMsg(99.99, (0.1, 0.2, 0.3), (1.0, 2.0, 9.8)))
    g = np.zeros((8, 6), np.uint8)
    ros.subs[rn.DEFAULT_CAMERA_TOPIC](_ImageMsg(100.0, g, "mono8"))
    assert sys_.calls == [
        ("fusion", 100.0, (0.1, 0.2, 0.3, 1.0, 2.0, 9.8))
    ]


def test_monocular_node_custom_topics():
    ros = _FakeRospy()
    sys_ = _FakeSystem()
    cfg = rn.NodeConfig(camera_topic="/cam0", base_frame="map",
                        use_image_timestamps=False)
    rn.MonocularNode(sys_, cfg=cfg, ros=ros).start()
    ros.subs["/cam0"](_ImageMsg(50.0, np.zeros((4, 4), np.uint8), "mono8"))
    m = ros.pubs[rn.ODOM_TOPIC].msgs[0]
    assert m["frame_id"] == "map"
    assert m["stamp"] != 50.0  # wall-clock stamp when passthrough disabled
