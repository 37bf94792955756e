"""Animated HTML explainer suite (`pautdx.viz.explain`) — the manim
video suite (`signals/improved_multisignal/visualization/README.md`)
re-rendered as dependency-free browser animations. Checks every scene
generates, embeds parseable DATA JSON with the scene's real payload,
and carries the animation scaffold; the autogates scene must embed the
gates actually found by `pautdx.utils.autogates.find_gates`.
"""

import base64
import json
import os
import re
import subprocess
import sys

import numpy as np
import pytest

from pautdx.viz.explain import _SCENES, build_explainers


def _strip_js_strings(js: str) -> str:
    out, i, n = [], 0, len(js)
    while i < n:
        c = js[i]
        if c in ("'", '"', "`"):
            q = c
            i += 1
            while i < n and js[i] != q:
                i += 2 if js[i] == "\\" else 1
            i += 1
            out.append('""')
        elif js[i:i + 2] == "//":
            while i < n and js[i] != "\n":
                i += 1
        else:
            out.append(c)
            i += 1
    return "".join(out)


@pytest.fixture(scope="module")
def scenes(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("explainers"))
    paths = build_explainers(out)
    return out, paths


def test_all_scenes_written(scenes):
    out, paths = scenes
    assert len(paths) == len(_SCENES) + 1          # scenes + index
    for name in _SCENES:
        assert os.path.exists(os.path.join(out, name))
    index = open(os.path.join(out, "index.html")).read()
    for name in _SCENES:
        assert name in index


@pytest.mark.parametrize("name", sorted(_SCENES))
def test_scene_payload_and_scaffold(scenes, name):
    out, _ = scenes
    src = open(os.path.join(out, name)).read()
    m = re.search(r"const DATA = (\{.*?\});\n", src, re.S)
    data = json.loads(m.group(1))                  # embedded JSON parses
    assert "duration_ms" in data
    assert "function draw" in src
    assert "requestAnimationFrame" in src
    # balanced JS (with string/template literals stripped): catches
    # truncated embeds and broken f-string interpolation
    js = _strip_js_strings(re.search(r"<script>(.*)</script>", src,
                                     re.S).group(1))
    for a, b in (("{", "}"), ("(", ")"), ("[", "]")):
        assert js.count(a) == js.count(b), (name, a)


def test_autogates_scene_embeds_real_gates(scenes):
    from pautdx.utils.autogates import find_gates
    from pautdx.viz.explain import _demo_volume

    out, _ = scenes
    src = open(os.path.join(out, "autogates.html")).read()
    data = json.loads(re.search(r"const DATA = (\{.*?\});\n", src,
                                re.S).group(1))
    _, _, vol = _demo_volume(7)
    want = [[int(a), int(b)] for a, b in find_gates(np.abs(vol[2]))]
    assert data["gates"] == want
    # the embedded volume image round-trips
    img = np.frombuffer(base64.b64decode(data["img"]), np.uint8)
    assert img.size == data["N"] * data["S"]
    assert img.max() > 100                         # wall echoes present


def test_cli_explain(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "pautdx.cli", "explain",
         "--out", str(tmp_path / "ex")],
        capture_output=True, text=True, env=env, timeout=300)
    assert r.returncode == 0, r.stderr[-800:]
    assert (tmp_path / "ex" / "index.html").exists()
