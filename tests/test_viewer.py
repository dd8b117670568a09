"""Viewer server (the modern counterpart of the reference's dormant SIBR
network_gui): render_png and the HTTP scrub endpoint."""

import urllib.request

import numpy as np

from gsvc_tpu.render.pipeline import make_raster_settings
from gsvc_tpu.viewer import ViewerServer
from tests.test_model import make_state


def _server():
    cfg, state = make_state(n=64, capacity=64, seed=3)
    settings = make_raster_settings(cfg, 24, 32, tile_h=8, tile_w=16,
                                    gaussian_cap=64, chunk=16)
    return ViewerServer(state, cfg, settings, 32,
                        frame_zs=np.array([0.0, 0.01, 0.02]),
                        x_min=-0.6, y_min=-0.45, scale=26.0)


def test_render_png_and_cache():
    v = _server()
    png = v.render_png(1)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    assert v.render_png(1) is png  # cached
    assert v.render_png(99)        # clamped to last frame


def test_http_scrub_endpoint():
    v = _server()
    httpd = v.serve(port=0, background=True)
    port = httpd.server_address[1]
    try:
        page = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=30).read()
        assert b"gsvc-tpu viewer" in page
        frame = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/frame/0", timeout=60).read()
        assert frame[:8] == b"\x89PNG\r\n\x1a\n"
    finally:
        httpd.shutdown()
