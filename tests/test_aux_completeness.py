"""Auxiliary completeness tests: flow I/O, video dataset, memcached client
protocol (against an in-process fake server)."""

import os
import socket
import threading

import numpy as np
import pytest

from lowlight_image_enhancement_tpu.data.memcached_client import (
    MemcachedBackend,
    MemcachedClient,
)
from lowlight_image_enhancement_tpu.data.video_dataset import (
    VideoFrameDataset,
    pad_frame_indices,
)
from lowlight_image_enhancement_tpu.utils.flow_util import (
    flow_to_color,
    flowread,
    flowwrite,
)


class TestFlowUtil:
    def test_flo_roundtrip(self, tmp_path, rng):
        flow = rng.standard_normal((12, 17, 2)).astype(np.float32)
        path = str(tmp_path / "a.flo")
        flowwrite(flow, path)
        back = flowread(path)
        np.testing.assert_array_equal(back, flow)

    def test_bad_magic_raises(self, tmp_path):
        p = tmp_path / "bad.flo"
        p.write_bytes(b"\x00" * 16)
        with pytest.raises(ValueError, match="magic"):
            flowread(str(p))

    def test_flow_to_color(self, rng):
        flow = rng.standard_normal((8, 8, 2)).astype(np.float32)
        rgb = flow_to_color(flow)
        assert rgb.shape == (8, 8, 3)
        assert rgb.min() >= 0 and rgb.max() <= 1
        # zero flow -> white
        white = flow_to_color(np.zeros((4, 4, 2)), max_magnitude=1.0)
        np.testing.assert_allclose(white, 1.0, atol=1e-6)


class TestFrameIndices:
    def test_reflection_padding(self):
        assert pad_frame_indices(0, 10, 5, "reflection") == [2, 1, 0, 1, 2]
        assert pad_frame_indices(9, 10, 5, "reflection") == [7, 8, 9, 8, 7]
        assert pad_frame_indices(5, 10, 5, "reflection") == [3, 4, 5, 6, 7]

    def test_replicate_padding(self):
        assert pad_frame_indices(0, 10, 5, "replicate") == [0, 0, 0, 1, 2]


class TestVideoDataset:
    @pytest.fixture
    def video_root(self, tmp_path, rng):
        from lowlight_image_enhancement_tpu.utils import imgio

        for clip in ("clip_a", "clip_b"):
            for sub in ("gt", "lq"):
                os.makedirs(tmp_path / sub / clip)
            for fi in range(6):
                img = rng.integers(0, 255, (24, 24, 3)).astype("uint8")
                imgio.imwrite(str(tmp_path / "gt" / clip /
                                  f"{fi:08d}.png"), img)
                imgio.imwrite(str(tmp_path / "lq" / clip /
                                  f"{fi:08d}.png"), img // 2)
        return tmp_path

    def test_item_protocol(self, video_root):
        ds = VideoFrameDataset(
            dataroot_gt=str(video_root / "gt"),
            dataroot_lq=str(video_root / "lq"),
            num_frame=5, phase="train", gt_size=16,
        )
        assert len(ds) == 12
        item = ds[0]
        assert item["lq"].shape == (5, 16, 16, 3)
        assert item["gt"].shape == (16, 16, 3)
        assert item["key"].startswith("clip_a/")

    def test_registry(self, video_root):
        from lowlight_image_enhancement_tpu.data import create_dataset

        ds = create_dataset({
            "type": "VideoFrameDataset",
            "dataroot_gt": str(video_root / "gt"),
            "dataroot_lq": str(video_root / "lq"),
            "phase": "val",
        })
        assert ds[3]["lq"].shape[0] == 5


class _FakeMemcached(threading.Thread):
    """Minimal in-process memcached server for protocol tests."""

    def __init__(self):
        super().__init__(daemon=True)
        self.store = {}
        self.sock = socket.socket()
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(1)
        self.port = self.sock.getsockname()[1]

    def run(self):
        conn, _ = self.sock.accept()
        buf = b""
        while True:
            data = conn.recv(4096)
            if not data:
                return
            buf += data
            while b"\r\n" in buf:
                line, buf = buf.split(b"\r\n", 1)
                parts = line.split()
                if not parts:
                    continue
                if parts[0] == b"get":
                    key = parts[1].decode()
                    if key in self.store:
                        val = self.store[key]
                        conn.sendall(
                            f"VALUE {key} 0 {len(val)}\r\n".encode()
                            + val + b"\r\nEND\r\n")
                    else:
                        conn.sendall(b"END\r\n")
                elif parts[0] == b"set":
                    nbytes = int(parts[4])
                    while len(buf) < nbytes + 2:
                        buf += conn.recv(4096)
                    self.store[parts[1].decode()] = buf[:nbytes]
                    buf = buf[nbytes + 2:]
                    conn.sendall(b"STORED\r\n")


class TestMemcached:
    def test_set_get_roundtrip(self):
        server = _FakeMemcached()
        server.start()
        client = MemcachedClient(port=server.port)
        assert client.set("img1", b"\x89PNGdata")
        assert client.get("img1") == b"\x89PNGdata"
        assert client.get("missing") is None
        client.close()

    def test_backend_raises_on_miss_and_unreachable(self):
        server = _FakeMemcached()
        server.start()
        backend = MemcachedBackend(port=server.port)
        with pytest.raises(KeyError):
            backend.get("nope")
        backend.close()
        dead = MemcachedClient(port=1)  # nothing listens on port 1
        with pytest.raises(ConnectionError, match="unreachable"):
            dead.get("x")
