"""CLI, web-app route, and viewer tests."""

import json
import os
import sys
import threading
import urllib.request

import numpy as np
import pytest


def test_cli_parser_reference_surface():
    from rtvm_tpu.cli import build_parser

    p = build_parser()
    args = p.parse_args(["mosaic", "video.mp4", "--output-dir", "out", "--hide"])
    assert args.video_path == "video.mp4"
    assert args.output_dir == "out"
    assert args.hide
    args = p.parse_args(["mosaic", "--images-dir", "imgs"])
    assert args.images_dir == "imgs"
    assert p.parse_args(["slam", "--webcam"]).webcam
    assert p.parse_args(["terrain", "x.jpg", "--fast"]).fast


def test_cli_default_subcommand_compat():
    """`rtvm <video>` (no subcommand) must behave like the reference main.py CLI."""
    from rtvm_tpu import cli

    captured = {}

    def fake_run(**kw):
        captured.update(kw)

    import rtvm_tpu.pipelines.mosaic_pipeline as mp

    orig = mp.main
    mp.main = lambda **kw: captured.update(kw)
    try:
        cli.main(["some_video.mp4", "--hide"])
    finally:
        mp.main = orig
    assert captured["video_path"] == "some_video.mp4"
    assert captured["show_intermediate"] is False


def test_viewer_renders_png(tmp_path, rng):
    from rtvm_tpu.io.ply import write_ply_points
    from rtvm_tpu.viz.pointcloud_viewer import scan_and_describe, view_matplotlib

    pts = rng.rand(500, 3).astype(np.float32)
    cols = (rng.rand(500, 3) * 255).astype(np.uint8)
    p = str(tmp_path / "cloud.ply")
    write_ply_points(p, pts, cols)
    png = view_matplotlib(p)
    assert os.path.exists(png)
    items = scan_and_describe(str(tmp_path))
    assert any(i["kind"] == "cloud" for i in items)


@pytest.fixture()
def web_server(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    sys.path.insert(0, "/root/repo")
    import importlib

    import ui.web_app as wa

    importlib.reload(wa)
    from http.server import HTTPServer

    srv = HTTPServer(("127.0.0.1", 0), wa.Handler)
    port = srv.server_address[1]
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    yield f"http://127.0.0.1:{port}", wa
    srv.shutdown()


def test_web_routes(web_server, tmp_path):
    base, wa = web_server
    html = urllib.request.urlopen(base + "/").read().decode()
    assert "Аэромозаика" in html
    js = urllib.request.urlopen(base + "/static/js/app.js").read().decode()
    assert "progress" in js
    prog = json.loads(urllib.request.urlopen(base + "/progress").read())
    assert prog["state"] == "idle"
    # upload raw body
    req = urllib.request.Request(base + "/upload", data=b"fakevideo", method="POST")
    resp = json.loads(urllib.request.urlopen(req).read())
    assert resp["ok"]
    assert wa._current_video["path"] is not None
    # results listing
    os.makedirs("results", exist_ok=True)
    with open("results/mosaic.jpg", "wb") as f:
        f.write(b"notajpeg")
    res = json.loads(urllib.request.urlopen(base + "/results").read())
    assert "mosaic.jpg" in res["files"]
    body = urllib.request.urlopen(base + "/results-files/mosaic.jpg").read()
    assert body == b"notajpeg"


def test_interactive_html_viewers(tmp_path, rng):
    """Plotly-counterpart interactive viewers (VERDICT r2 item 9): cloud,
    Mesh3d-style mesh with vertex colors, and side-by-side cloud+mesh must all
    emit self-contained interactive HTML (works without plotly in this env)."""
    from rtvm_tpu.io.ply import write_obj_mesh, write_ply_points
    from rtvm_tpu.viz.pointcloud_viewer import (
        view_interactive, view_mesh_interactive, view_side_by_side,
    )

    pts = rng.rand(300, 3).astype(np.float32)
    cols = (rng.rand(300, 3) * 255).astype(np.uint8)
    ply = str(tmp_path / "cloud.ply")
    write_ply_points(ply, pts, cols)
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    faces = np.array([[0, 1, 2], [0, 1, 3], [1, 2, 3]], np.int32)
    obj = str(tmp_path / "mesh.obj")
    write_obj_mesh(obj, verts, faces)

    out1 = view_interactive(ply)
    out2 = view_mesh_interactive(obj)
    out3 = view_side_by_side(ply, obj)
    for out, needle in ((out1, '"points"'), (out2, '"mesh"'), (out3, '"xoff"')):
        assert out.endswith(".html") and os.path.exists(out)
        html = open(out).read()
        assert "<canvas" in html and "SCENE" in html and needle in html
    # side-by-side contains both object kinds, mesh shifted in +x
    html3 = open(out3).read()
    assert html3.count('"kind"') == 2
