"""Download utility tests against an in-process HTTP server (no egress)."""

import hashlib
import http.server
import os
import threading

import pytest

from lowlight_image_enhancement_tpu.utils.download_util import (
    download_file_from_url,
    load_file_from_url,
    sha256_of,
)


@pytest.fixture(scope="module")
def http_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("www")
    payload = os.urandom(70000)
    (root / "model.bin").write_bytes(payload)

    handler = lambda *a, **k: http.server.SimpleHTTPRequestHandler(
        *a, directory=str(root), **k)
    server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{server.server_port}", payload
    server.shutdown()


class TestDownload:
    def test_basic_download_and_sha(self, http_root, tmp_path):
        base, payload = http_root
        dest = str(tmp_path / "model.bin")
        sha = hashlib.sha256(payload).hexdigest()
        out = download_file_from_url(f"{base}/model.bin", dest,
                                     expected_sha256=sha, progress=False)
        assert out == dest
        assert open(dest, "rb").read() == payload

    def test_sha_mismatch_raises(self, http_root, tmp_path):
        base, _ = http_root
        with pytest.raises(ValueError, match="sha256 mismatch"):
            download_file_from_url(f"{base}/model.bin",
                                   str(tmp_path / "m2.bin"),
                                   expected_sha256="0" * 64,
                                   progress=False)

    def test_cache_hit_skips_download(self, http_root, tmp_path):
        base, payload = http_root
        model_dir = str(tmp_path / "zoo")
        p1 = load_file_from_url(f"{base}/model.bin", model_dir=model_dir)
        assert sha256_of(p1) == hashlib.sha256(payload).hexdigest()
        # poison the server path: cache hit must not re-fetch
        p2 = load_file_from_url("http://127.0.0.1:1/model.bin",
                                model_dir=model_dir)
        assert p1 == p2
