"""Conditional real-dependency tests (VERDICT r2 #9): the ExifToolStage
subprocess branch and the PIL decode branch are container-gated stubs in
this sandbox; whenever a container DOES have the real tool, these tests
exercise the real path against known payloads. skip-if-missing markers keep
CI green either way — and prove the probes pick the real branch when it
exists."""

import shutil
import struct
import zlib

import pandas as pd
import pytest

HAS_EXIFTOOL = shutil.which("exiftool") is not None
try:
    from PIL import Image  # noqa: F401

    HAS_PIL = True
except ImportError:
    HAS_PIL = False


def _tiny_png(width: int = 3, height: int = 2) -> bytes:
    """Minimal valid RGB PNG built from the spec (no imaging lib needed)."""

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + b"\x10\x20\x30" * width for _ in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


@pytest.mark.skipif(not HAS_EXIFTOOL, reason="exiftool binary not in container")
@pytest.mark.usefixtures("ray_session")
def test_exiftool_real_subprocess_branch():
    import json

    import pyarrow as pa
    import ray.data as rd

    from auto_archiver_ray.stages.enrich import ExifToolStage

    tbl = pa.table({"payload": pa.array([_tiny_png()], pa.binary())})
    out = rd.from_arrow(tbl).map_batches(
        ExifToolStage, batch_format="pyarrow", concurrency=1
    ).to_pandas()
    meta = json.loads(out["exif_json"][0])
    # real exiftool reports the actual pixel geometry, not the magic-bytes stub
    assert meta.get("File Type") == "PNG"
    assert meta.get("Image Width") == "3"
    assert meta.get("Image Height") == "2"


@pytest.mark.skipif(not HAS_PIL, reason="PIL not in container")
@pytest.mark.usefixtures("ray_session")
def test_image_decode_real_pil_branch():
    import pyarrow as pa
    import ray.data as rd

    from auto_archiver_ray.stages.multimodal import ImageDecodeStage

    tbl = pa.table({"payload": pa.array([_tiny_png(5, 4), b"not an image"], pa.binary())})
    out = rd.from_arrow(tbl).map_batches(
        ImageDecodeStage, batch_format="pyarrow", concurrency=1
    ).to_pandas()
    assert (out["width"][0], out["height"][0], bool(out["decode_ok"][0])) == (5, 4, True)
    assert not out["decode_ok"][1]  # real decoder rejects garbage


def test_probe_selects_stub_branch_when_tool_absent():
    """In THIS container (no exiftool/PIL) the stages must pick the
    deterministic stub branch — pins the probe logic itself."""
    from auto_archiver_ray.stages.enrich import ExifToolStage
    from auto_archiver_ray.stages.multimodal import ImageDecodeStage

    if not HAS_EXIFTOOL:
        assert ExifToolStage().exiftool is None
    if not HAS_PIL:
        assert ImageDecodeStage()._pil is None


def test_tiny_png_is_wellformed():
    """The fixture payload itself (checked so the conditional tests can't
    silently pass on a malformed file when PIL appears)."""
    png = _tiny_png(3, 2)
    assert png.startswith(b"\x89PNG")
    w, h = struct.unpack(">II", png[16:24])
    assert (w, h) == (3, 2)
    if HAS_PIL:
        import io

        from PIL import Image

        with Image.open(io.BytesIO(png)) as im:
            assert (im.width, im.height) == (3, 2)


HAS_FFMPEG = shutil.which("ffmpeg") is not None


@pytest.mark.skipif(not HAS_FFMPEG, reason="ffmpeg binary not in container")
def test_frame_sample_real_ffmpeg_branch(tmp_path):
    """When ffmpeg exists, decode=True grabs REAL PNG frames from a tiny
    synthesized video (ffmpeg's own lavfi test source keeps this
    self-contained)."""
    import json
    import subprocess

    import pyarrow as pa

    from auto_archiver_ray.stages.multimodal import FrameSampleStage

    vid = tmp_path / "t.mp4"
    subprocess.run(
        ["ffmpeg", "-v", "error", "-f", "lavfi", "-i", "testsrc=duration=2:size=64x64:rate=10",
         "-pix_fmt", "yuv420p", str(vid)],
        check=True,
    )
    batch = pa.table(
        {
            "media_id": ["v1"],
            "props_json": [json.dumps({"duration": 2.0})],
            "payload": pa.array([vid.read_bytes()], pa.binary()),
        }
    )
    stage = FrameSampleStage(decode=True)
    assert stage.ffmpeg is not None  # probe picked the real branch
    out = stage(batch)
    frames = out.column("frame_png").to_pylist()
    assert len(frames) == 1 and frames[0].startswith(b"\x89PNG")


def test_frame_sample_probe_selects_stub_when_ffmpeg_absent():
    from auto_archiver_ray.stages.multimodal import FrameSampleStage

    if not HAS_FFMPEG:
        assert FrameSampleStage(decode=True).ffmpeg is None
    assert FrameSampleStage(decode=False).ffmpeg is None  # no probe unless decoding
