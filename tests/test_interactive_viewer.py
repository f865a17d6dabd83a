"""Interactive-lite viewer (apps/interactive_viewer.py): the L5 live-loop
analogue driven headlessly with scripted keys — engine tick phases, WASD
camera mutation restarting accumulation, 'p' renderer toggle, screenshot
request/fill/resolve, ANSI presentation."""

import numpy as np

from bifrost3d_tpu.apps.interactive_viewer import frame_to_ansi, run


def test_scripted_session_toggles_and_moves(tmp_path):
    shot = tmp_path / "shot.png"
    frames, data, comp = run(
        scene_name="Sphere", width=32, height=24, ticks=6,
        scripted_keys="wwpx", display=False, screenshot_path=str(shot),
        max_bounce=1)
    cam = next(iter(data.cameras))
    frame = frames[int(cam)]
    assert frame.shape == (24, 32, 3)
    assert np.isfinite(np.asarray(frame)).all()
    # 'p' on tick 3 switched to the preview renderer.
    assert comp.renderers.get_name(data.cameras.get_renderer(cam)) == "Preview"
    # Two 'w' presses moved the camera forward (+z toward the scene).
    t = data.cameras.get_transform(cam)
    assert float(t.translation[2]) > -3.0
    # 'x' ran the screenshot request->fill->resolve pipeline to disk.
    assert shot.exists()


def test_settings_panel_adjusts_renderer_live(tmp_path):
    """The RenderingGUI analogue: 'g' opens the panel, down selects the
    max-bounce row, right increments it — the backend's RenderSettings
    change and its progressive accumulation restarts (RenderingGUI.cpp
    behavior)."""
    from bifrost3d_tpu.apps.interactive_viewer import RenderingPanel

    keys = ["", "", "g", "down", "right", "g", "", ""]
    frames, data, comp = run(
        scene_name="Sphere", width=16, height=12, ticks=len(keys) + 1,
        scripted_keys=keys, display=False, max_bounce=1)
    cam = next(iter(data.cameras))
    backend = comp._backends[(int(cam), data.cameras.get_renderer(cam))]
    assert backend.settings.max_bounce_count == 2      # 1 + one 'right'
    # Accumulation restarted on the settings change, then kept counting.
    assert 0 < backend.accumulations < len(keys) + 1
    assert np.isfinite(np.asarray(frames[int(cam)])).all()

    # Panel text renders rows with the selection marker.
    panel = RenderingPanel(data, comp, cam, [("PathTracer", 0)])
    panel.open = True
    lines = panel.lines()
    assert any("max bounces" in ln for ln in lines)
    assert any(ln.lstrip().startswith(">") for ln in lines)


def test_frame_to_ansi_halfblocks():
    img = np.zeros((4, 3, 3), np.float32)
    img[0, 0] = (1.0, 0.0, 0.0)
    s = frame_to_ansi(img)
    lines = s.split("\n")
    assert len(lines) == 2            # 4 rows -> 2 half-block lines
    assert "▀" in lines[0]
    assert "38;2;255;0;0" in lines[0]  # red upper pixel foreground
