"""Viewer smoke tests: both input modes driven end-to-end in subprocesses.

The LIVE path (raw-tty cbreak keypress loop + in-terminal ANSI display,
viewer.py — the analogue of the reference's per-frame input polling,
main.cpp:454-472/488-562) is driven through a real pty: keys are sent
mid-refinement with no newline, and the loop must orbit (camchanged
accumulation restart) and exit with a timestamped save. TYPED mode is
driven through a pipe. Slow-marked: each run pays a small CPU compile.
"""
import os
import re
import select
import subprocess
import sys
import time

import pytest

from pathtracer_tpu.scene.fixtures import scene_path

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_viewer_typed_mode(tmp_path):
    out = tmp_path / "live.png"
    p = subprocess.run(
        [sys.executable, "viewer.py", scene_path("cornell"),
         "--res", "32", "--cpu", "--typed", "--spp-per-step", "2",
         "--max-steps", "3", "--out", str(out)],
        cwd=REPO, input="a\ns\n", capture_output=True, text=True,
        timeout=420)
    assert p.returncode == 0, p.stderr[-2000:]
    assert out.exists()
    assert "saved" in p.stdout
    # the 'a' orbit restarts accumulation: after restart + 2 more steps the
    # spp counter shows 2*spp_per_step, not 3*
    assert re.search(r"\b4 spp\b", p.stdout), p.stdout[-2000:]
    for f in re.findall(r"saved (\S+samp\.png)", p.stdout):
        fp = os.path.join(REPO, f)
        if os.path.exists(fp):
            os.remove(fp)


def test_viewer_live_pty(tmp_path):
    pty = pytest.importorskip("pty")
    out = tmp_path / "live.png"
    pid, fd = pty.fork()
    if pid == 0:  # child: exec the viewer on the pty
        os.chdir(REPO)
        os.execvp(sys.executable,
                  [sys.executable, "viewer.py", scene_path("cornell"),
                   "--res", "32", "--cpu", "--display", "ansi",
                   "--spp-per-step", "2", "--max-steps", "6",
                   "--out", str(out)])
    buf = b""
    sent = False
    t0 = time.time()
    try:
        while time.time() - t0 < 420:
            r, _, _ = select.select([fd], [], [], 0.5)
            if r:
                try:
                    chunk = os.read(fd, 65536)
                except OSError:
                    break
                if not chunk:
                    break
                buf += chunk
                if not sent and b"spp" in buf:
                    os.write(fd, b"d")  # orbit right, no newline
                    sent = True
            done, status = os.waitpid(pid, os.WNOHANG)
            if done:
                break
        else:
            os.kill(pid, 9)
            pytest.fail("viewer did not finish in time")
    finally:
        os.close(fd)
    assert sent, "never saw a frame status line"
    assert out.exists()
    assert b"\x1b[38;2;" in buf          # truecolor half-block cells drawn
    assert "▀".encode() in buf
    assert b"samp.png" in buf            # exit saved a timestamped PNG
    m = re.search(rb"saved (\S+samp\.png)", buf)
    if m:
        fp = os.path.join(REPO, m.group(1).decode())
        if os.path.exists(fp):
            os.remove(fp)
