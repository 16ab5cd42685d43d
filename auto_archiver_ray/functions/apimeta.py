"""API-payload metadata normalization kernels.

Parity targets:
- ``YTDLP_NOISE_KEYS`` + ``clean_video_data``: the GenericExtractor's
  yt-dlp key cleanup (ref:modules/generic_extractor/
  generic_extractor.py:224-295 — the exact base_keys list) plus the
  per-platform extension hook (mirrors dropin ``keys_to_clean``).
- ``cleanup_dict``: the Instagram API extractor's recursive
  empty/coordinate stripper (ref:modules/instagram_api_extractor/
  instagram_api_extractor.py:77-91): drop values in
  {0.0, 0, [], {}, "", None, "null"} and keys in {x, y, width, height},
  recursing through dicts and lists.
"""

from __future__ import annotations

from typing import Any

# exact base_keys list (duplicates included in the reference; set() applied
# at use time keeps behavior identical for membership tests)
YTDLP_NOISE_KEYS = [
    "formats",
    "thumbnail",
    "display_id",
    "epoch",
    "requested_downloads",
    "duration_string",
    "thumbnails",
    "http_headers",
    "webpage_url_basename",
    "webpage_url_domain",
    "extractor",
    "extractor_key",
    "playlist",
    "playlist_index",
    "duration_string",
    "protocol",
    "requested_subtitles",
    "format_id",
    "acodec",
    "vcodec",
    "ext",
    "epoch",
    "_has_drm",
    "filesize",
    "audio_ext",
    "video_ext",
    "vbr",
    "abr",
    "resolution",
    "dynamic_range",
    "aspect_ratio",
    "cookies",
    "format",
    "quality",
    "preference",
    "artists",
    "channel_id",
    "subtitles",
    "tbr",
    "url",
    "original_url",
    "automatic_captions",
    "playable_in_embed",
    "live_status",
    "_format_sort_fields",
    "chapters",
    "requested_formats",
    "format_note",
    "audio_channels",
    "asr",
    "fps",
    "was_live",
    "is_live",
    "heatmap",
    "age_limit",
    "stretched_ratio",
]


def clean_video_data(video_data: dict, extra_keys: list[str] | None = None) -> dict:
    """Strip yt-dlp noise keys (+ platform extras) from an API payload."""
    drop = set(YTDLP_NOISE_KEYS) | set(extra_keys or [])
    return {k: v for k, v in video_data.items() if k not in drop}


_EMPTYISH = (0.0, 0, [], {}, "", None, "null")
_COORD_KEYS = ("x", "y", "width", "height")


def cleanup_dict(d: Any) -> Any:
    """Recursive empty-value / coordinate-key stripper — the reference's
    exact membership test (``clean_v not in [0.0, 0, [], {}, "", None,
    "null"]``, which via == also drops False since bool is int)."""
    if isinstance(d, list):
        return [cleanup_dict(v) for v in d]
    if not isinstance(d, dict):
        return d
    return {
        k: clean_v
        for k, v in d.items()
        if (clean_v := cleanup_dict(v)) not in list(_EMPTYISH) and k not in _COORD_KEYS
    }
