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


# ---------------------------------------------------------------------------
# Instagram API scrape normalization (the portable halves of
# ref:modules/instagram_api_extractor/instagram_api_extractor.py:302-392;
# downloads become media-URL plan entries instead of fetches)
# ---------------------------------------------------------------------------

_IG_VERSION_KEYS = [
    "image_versions", "video_versions", "video_dash_manifest",
    "image_versions2", "video_versions2",
]


def instagram_scrape_media(item: dict, context: str | None = None, minimize: bool = True):
    """ref:instagram_api_extractor.py:337-392 — returns (cleaned_item,
    media_dict_or_None, media_id). media_dict records the URLs the
    reference would download: kind, media_url, preview_url, date, post
    url (from code), caption text, and the cleaned item as data."""
    item = dict(item)
    if minimize:
        for k in _IG_VERSION_KEYS:
            item.pop(k, None)
    item = cleanup_dict(item)

    preview_url = item.get("thumbnail_url")
    best_id = item.get("id", item.get("pk"))
    taken_at = item.get("taken_at", item.get("taken_at_ts"))
    code = item.get("code")
    caption_text = item.get("caption_text")
    item.pop("carousel_media", None)

    def decorate(m: dict) -> dict:
        if taken_at:
            m["date"] = taken_at
        if code:
            m["url"] = f"https://www.instagram.com/p/{code}"
        if caption_text:
            m["text"] = caption_text
        m["data"] = [item]
        return m

    if video_url := item.get("video_url"):
        media = decorate({"kind": "video", "media_url": video_url, "preview_url": preview_url})
        return item, media, f"{context or 'video'} {best_id}"
    if preview_url:
        media = decorate({"kind": "image", "media_url": preview_url, "preview_url": None})
        return item, media, f"{context or 'image'} {best_id}"
    return item, None, None


def instagram_scrape_item(item: dict, context: str | None = None, minimize: bool = True) -> dict:
    """ref:instagram_api_extractor.py:302-334 — clips_metadata text rescue,
    post URL from code, main media from the item or its first resource,
    remaining resources recursed into 'other media'. Returns
    {item, url, media, media_id, other_media}; raises AssertionError when
    no media found (the reference's assert)."""
    item = dict(item)
    out: dict = {"url": None, "other_media": []}
    if "clips_metadata" in item:
        if reusable_text := item.get("clips_metadata", {}).get("reusable_text_attribute_string"):
            item["clips_metadata_text"] = reusable_text
        if minimize:
            del item["clips_metadata"]

    if code := item.get("code"):
        out["url"] = f"https://www.instagram.com/p/{code}/"

    resources = item.get("resources", item.get("carousel_media", []))
    item, media, media_id = instagram_scrape_media(item, context, minimize)
    if not media and len(resources):
        _, media, media_id = instagram_scrape_media(resources[0], context, minimize)
        resources = resources[1:]
    assert media, f"Image/video not found in {item=}"

    for r in resources:
        try:
            sub = instagram_scrape_item(r, context, minimize)
            out["other_media"].append(sub["media"])
        except AssertionError:
            continue
    out["item"] = item
    out["media"] = media
    out["media_id"] = media_id
    return out


# ---------------------------------------------------------------------------
# Instaloader-path normalization (the session extractor's portable half,
# ref:modules/instagram_extractor/instagram_extractor.py:24-162)
# ---------------------------------------------------------------------------

# The INTENDED patterns (documented at the reference's regex101 links). The
# reference composes them with "{valid_url}".format(valid_url=<compiled
# pattern>) — str() of a compiled regex is "re.compile('...')", so as
# written (ref::25-29) neither post_pattern nor profile_pattern can ever
# match and download() always returns None. We restore the documented
# semantics (compose from .pattern) and keep the routing contract: post is
# tested BEFORE profile (ref::24 "NB: post regex should be tested before
# profile").
INSTAGRAM_VALID_URL = r"(?:(?:http|https):\/\/)?(?:www.)?(?:instagram.com|instagr.am|instagr.com)\/"
_IG_POST_RE = None
_IG_PROFILE_RE = None


def _ig_res():
    global _IG_POST_RE, _IG_PROFILE_RE
    if _IG_POST_RE is None:
        import re

        _IG_POST_RE = re.compile(rf"{INSTAGRAM_VALID_URL}(?:p|reel)\/(\w+)")
        _IG_PROFILE_RE = re.compile(rf"{INSTAGRAM_VALID_URL}(\w+)")
    return _IG_POST_RE, _IG_PROFILE_RE


def instagram_url_kind(url: str) -> tuple[str, str]:
    """('post', shortcode) | ('profile', username) | ('', '') — the
    download() routing of ref::56-73 with post tested first."""
    post_re, profile_re = _ig_res()
    if m := post_re.findall(url):
        return "post", m[0]
    if m := profile_re.findall(url):
        return "profile", m[0]
    return "", ""


def instaloader_profile_targets(username: str) -> dict[str, str]:
    """The per-category download-target naming contract of
    download_profile (ref::95-137) — posts, tagged, igtv, stories,
    highlights."""
    return {
        "post": f"profile_post_{username}",
        "tagged": f"tagged_post_{username}",
        "igtv": f"igtv_post_{username}",
        "story": f"story_item_{username}",
        "highlight": f"highlight_item_{username}",
    }


def instaloader_media_plan(filenames: list[str]) -> list[str]:
    """process_downloads' file walk (ref::147-158): drop ``*.txt``
    sidecars, REQUIRE more than one remaining file (the reference's own
    ``assert len(all_media) > 1`` — a post that downloaded a single media
    file fails with "No uploaded media found"; quirk kept verbatim), sort
    by filename DESCENDING. Returns [] on the failure path."""
    media = [f for f in filenames if f[-4:] != ".txt"]
    if len(media) <= 1:
        return []
    return sorted(media, reverse=True)


def instaloader_metadata(
    url: str, title: str, node: dict, date, filenames: list[str]
) -> dict | None:
    """process_downloads' Metadata assembly (ref::143-160): title, content =
    str(node dict), timestamp, media in the plan order, success status
    'instagram: success'. None on the no-media failure path (the reference
    logs and returns None)."""
    media = instaloader_media_plan(filenames)
    if not media:
        return None
    return {
        "url": url,
        "title": title,
        "content": str(node),
        "timestamp": date,
        "media": media,
        "status": "instagram: success",
    }


def instaloader_post_title(url: str, post_title: str | None, owner: str | None) -> str:
    """Post path title = post.title (download_post, ref::82-87); profile
    path title = '@username' (download_profile, ref::141)."""
    kind, token = instagram_url_kind(url)
    if kind == "profile":
        return f"@{token}"
    return post_title or ""


# ---------------------------------------------------------------------------
# Instagram-via-Telegram-bot normalization (the tbot extractor's portable
# protocol half, ref:modules/instagram_tbot_extractor/instagram_tbot_extractor.py:69-126;
# the Telethon session/network plumbing is not portable)
# ---------------------------------------------------------------------------

TBOT_FILLER = "The bot receives information through https://hikerapi.com/"
TBOT_INVALID = "You must enter a URL to a post"
TBOT_NOT_FOUND = "Media not found or unavailable"


def tbot_collect(
    posts: list[dict],
    chat_id: int,
    since_id: int,
    seen_media: list[int] | None = None,
) -> tuple[str, list[str], int, list[int]]:
    """One polling attempt over the bot's replies (_process_messages inner
    loop, ref::113-125): ``posts`` iterate NEWEST-FIRST with id > since_id
    (telethon iter_messages order); the hikerapi filler post is skipped
    entirely (its media too — the reference ``continue``s before the media
    branch); unseen media posts yield download keys ``f"{chat_id}_{id}"``;
    post texts concatenate in iteration order. Returns
    (message_fragment, media_keys, new_since_id, seen_media)."""
    seen_media = list(seen_media or [])
    media_keys: list[str] = []
    message = ""
    for post in posts:
        since_id = max(since_id, post["id"])
        if TBOT_FILLER in (post.get("message") or ""):
            continue
        if post.get("media") and post["id"] not in seen_media:
            media_keys.append(f"{chat_id}_{post['id']}")
            seen_media.append(post["id"])
        if post.get("message"):
            message += post["message"]
    return message, media_keys, since_id, seen_media


def tbot_outcome(message: str, n_media: int) -> dict | None:
    """The download() decision tree (ref::80-94): the invalid-link and
    media-not-found bot replies fail; any text → content=message,
    title=message[:128], status 'insta-via-bot: success'; no text but
    media present → success with empty content; neither → None (the
    reference's is_empty() fail path). ``message`` is the stripped
    concatenation across attempts."""
    message = message.strip()
    if TBOT_INVALID in message:
        return None
    if TBOT_NOT_FOUND in message:
        return None
    if message:
        return {
            "content": message,
            "title": message[:128],
            "status": "insta-via-bot: success",
        }
    if n_media:
        return {"content": "", "title": "", "status": "insta-via-bot: success"}
    return None
