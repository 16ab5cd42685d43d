"""Platform dropin parse kernels: tiktok / bluesky / truth / facebook.

The reference's generic-extractor dropins are mostly network plumbing around
small pure post→metadata transforms; those transforms are ported here as
batch-friendly kernels (no requests/yt-dlp — the payload arrives as a column:
an API-response JSON dict for tiktok/bluesky/truth, raw html for facebook).

Parity targets (cited per function):
- tiktok: tikwm payload handling, ref:modules/generic_extractor/tiktok.py:29-123
- bluesky: post-thread record normalization + embed blob URL derivation,
  ref:modules/generic_extractor/bluesky.py:9-83
- truth: status-JSON normalization incl. tuple-key traversal,
  ref:modules/generic_extractor/truth.py:15-67
- facebook: webpage metadata scrape (data-sjs JSON scan, og:/twitter: meta
  fallbacks, uiHeaderTitle, data-utime, thumbnail retrievability check,
  "| Facebook" title cleanup), ref:modules/generic_extractor/facebook.py:19-154
"""

from __future__ import annotations

import html as _html
import json
import re
from datetime import datetime, timezone
from typing import Any

# ---------------------------------------------------------------------------
# TikTok (tikwm API payload)
# ---------------------------------------------------------------------------

TIKTOK_PHOTO_URL_RE = re.compile(r"https?://(?:www\.)?tiktok\.com/@[\w\.-]+/photo/\d+")
_TIKTOK_URL_RE = re.compile(r"https?://(?:www\.|m\.|vm\.|vt\.)?tiktok\.com/")

# the dropin's api_data passthrough keys (ref:tiktok.py:55-82) — everything
# it folds into one api_data field instead of top-level metadata
TIKTOK_KEYS_TO_CLEAN = [
    "video_url", "title", "create_time", "author", "cover", "origin_cover",
    "ai_dynamic_cover", "duration", "size", "wm_size", "music", "music_info",
    "play_count", "digg_count", "comment_count", "share_count",
    "download_count", "collect_count", "anchors", "anchors_extras", "is_ad",
    "commerce_info", "commercial_video_info", "item_comment_settings",
    "mentioned_users",
]


def tiktok_suitable(url: str) -> bool:
    """Dropin routing: any tiktok URL (video/live/vm/user) or photo post
    (ref:tiktok.py:19-27; the IE classes all reduce to tiktok.com hosts)."""
    return bool(_TIKTOK_URL_RE.match(url)) or bool(TIKTOK_PHOTO_URL_RE.match(url))


def tiktok_extract_post(api_response: dict) -> dict:
    """tikwm response → post dict: require msg=success + data; pick the
    non-watermarked play URL first, reject audio-mime play URLs
    (ref:tiktok.py:29-53). Raises ValueError exactly where the reference
    does."""
    if not api_response.get("msg") == "success" or not (api_data := api_response.get("data", {})):
        raise ValueError(f"Unable to download with tikwm.com: {repr(api_response)}")
    play_url = api_data.pop("play", api_data.pop("wmplay", None))
    if play_url and "mime_type=audio" in play_url:
        play_url = None
    if play_url:
        api_data["video_url"] = play_url
    return api_data


def tiktok_create_metadata(post: dict) -> dict:
    """Post dict → normalized metadata row (ref:tiktok.py:85-123):
    cover/images/video URLs become the media plan (download happens in the
    media plane, not here), title/timestamp/author extracted, everything
    else folded into api_data with empty values dropped. ``success`` is
    False when the post has neither images nor video — the caller treats
    that as the reference's 'possibly deleted or private' ValueError."""
    post = dict(post)
    media_urls: list[str] = []
    cover_url = post.pop("origin_cover", post.pop("cover", post.pop("ai_dynamic_cover", None)))
    if cover_url:
        media_urls.append(cover_url)
    is_success = False
    for image_url in post.pop("images", []):
        media_urls.append(image_url)
        is_success = True
    duration = None
    if video_url := post.pop("video_url", None):
        media_urls.append(video_url)
        duration = post.pop("duration", None)
        is_success = True
    title = post.pop("title", "")
    ts = ""
    if created_at := post.pop("create_time", None):
        ts = datetime.fromtimestamp(created_at, tz=timezone.utc).isoformat()
    author = post.pop("author", None)
    return {
        "status": "yt-dlp_TikTok: success" if is_success else "",
        "title": title,
        "timestamp": ts,
        "author": author,
        "duration": duration,
        "media_links": media_urls,
        "api_data": {k: v for k, v in post.items() if v},
        "success": is_success,
    }


# ---------------------------------------------------------------------------
# Bluesky (app.bsky getPostThread payload)
# ---------------------------------------------------------------------------

_BSKY_BLOB_URL = "https://bsky.social/xrpc/com.atproto.sync.getBlob?cid={}&did={}"


def bluesky_embed_urls(post: dict) -> list[str]:
    """Blob URLs for a post's image(s)/video embeds — 1 video XOR ≥1 images
    (ref:bluesky.py:30-55)."""
    embed = post.get("record", {}).get("embed", {})
    image_medias = embed.get("images", []) + embed.get("media", {}).get("images", [])
    video_medias = [e for e in [embed.get("video"), embed.get("media", {}).get("video")] if e]
    did = post["author"]["did"]
    urls = [_BSKY_BLOB_URL.format(m["image"]["ref"]["$link"], did) for m in image_medias]
    urls += [_BSKY_BLOB_URL.format(m["ref"]["$link"], did) for m in video_medias]
    return urls


def bluesky_post_data(post: dict) -> dict:
    """author/mentions/tags/links from the record facets, with the author's
    empty labels and 'associated' blob dropped (ref:bluesky.py:57-83).
    Returns only non-empty lists — exactly the reference's conditional
    sets."""
    author = dict(post["author"])
    if "labels" in author and not author["labels"]:
        del author["labels"]
    if "associated" in author:
        del author["associated"]
    mentions, tags, links = [], [], []
    for f in post.get("record", {}).get("facets", []):
        for feature in f["features"]:
            if feature["$type"] == "app.bsky.richtext.facet#mention":
                mentions.append(feature["did"])
            elif feature["$type"] == "app.bsky.richtext.facet#tag":
                tags.append(feature["tag"])
            elif feature["$type"] == "app.bsky.richtext.facet#link":
                links.append(feature["uri"])
    res: dict[str, Any] = {"author": author}
    if mentions:
        res["mentions"] = mentions
    if tags:
        res["tags"] = tags
    if links:
        res["links"] = links
    return res


def bluesky_create_metadata(post: dict, url: str) -> dict:
    """Post → normalized row: title = record text, timestamp = createdAt,
    post data set for non-empty values, embeds become media links
    (ref:bluesky.py:9-23)."""
    data = {k: v for k, v in bluesky_post_data(post).items() if v}
    return {
        "status": "bluesky: success",
        "url": url,
        "title": post["record"]["text"],
        "timestamp": post["record"]["createdAt"],
        "media_links": bluesky_embed_urls(post),
        **data,
    }


# ---------------------------------------------------------------------------
# Truth Social (statuses API payload)
# ---------------------------------------------------------------------------

# keys copied verbatim incl. the duplicated replies_count (ref:truth.py:40-52)
TRUTH_POST_KEYS = [
    "replies_count", "reblogs_count", "favourites_count",
    ("account", "followers_count"), ("account", "following_count"),
    ("account", "statuses_count"), ("account", "display_name"),
    "language", "in_reply_to_account", "replies_count",
]


def _traverse(obj: Any, key) -> Any:
    if isinstance(key, tuple):
        for k in key:
            obj = obj.get(k) if isinstance(obj, dict) else None
            if obj is None:
                return None
        return obj
    return obj.get(key) if isinstance(obj, dict) else None


def truth_create_metadata(post: dict, url: str) -> dict:
    """Status JSON → normalized row (ref:truth.py:23-67): created_at parsed,
    content as description, account.username as author, the TRUTH_POST_KEYS
    basket with tuple keys flattened to space-joined names, and media
    attachment URLs as the media plan."""
    from . import timekit

    out: dict[str, Any] = {
        "status": "truth: success",
        "url": url,
        "timestamp": timekit.to_utc_iso(post["created_at"]),
        "description": post["content"],
        "author": post["account"]["username"],
    }
    for key in TRUTH_POST_KEYS:
        store_key = " ".join(key) if isinstance(key, tuple) else key
        out[store_key] = _traverse(post, key)
    out["media_links"] = [m["url"] for m in post.get("media_attachments", [])]
    return out


# ---------------------------------------------------------------------------
# Facebook (webpage scrape)
# ---------------------------------------------------------------------------

FACEBOOK_URL_RE = re.compile(
    r"(?:https?://(?:[\w-]+\.)?(?:facebook\.com||facebookwkhpilnemxj7asaniu7vnjjbiltxjqhye3mhbshg7kx5tfyd\.onion)/)"
)
_FB_POST_ID_RE = re.compile(r"(?P<id>pfbid[A-Za-z0-9]+|\d+|t\.(\d+\/\d+))")
_FB_PHOTO_RE = re.compile(r"/t.\d+/\d+")
_FB_SJS_RE = re.compile(r"data-sjs>({.*?ScheduledServerJS.*?})</script>")
_FB_UIHEADER_RE = re.compile(r'<h2\s+[^>]*class="uiHeaderTitle"[^>]*>([^<]*)</h2>')
_FB_OWNER_RE = re.compile(r'ownerName\s*:\s*"([^"]+)"')
_FB_AUTHOR_EL_RE = re.compile(
    r'<[^>]+id="fbPhotoPageAuthorName"[^>]*>(.*?)</[a-zA-Z0-9]+>', re.DOTALL
)
_FB_UTIME_RE = re.compile(r'<abbr[^>]+data-utime=["\'](\d+)')
_FB_TITLE_RE = re.compile(r"<title>(.+?)</title>", re.DOTALL | re.IGNORECASE)
_FB_VIEWCOUNT_RES = (
    re.compile(r'\bviewCount\s*:\s*["\']([\d,.]+)'),
    re.compile(r'video_view_count["\']\s*:\s*(\d+)'),
)


def facebook_suitable(url: str) -> bool:
    return bool(FACEBOOK_URL_RE.match(url))


def facebook_post_id(url: str) -> str:
    m = _FB_POST_ID_RE.search(url)
    return m.group("id") if m else ""


def facebook_skip_ytdlp(url: str) -> bool:
    """Photo posts (/t.XXXXX/XXXXX) skip the video downloader (ref:facebook.py:148-154)."""
    return bool(_FB_PHOTO_RE.search(url))


def _meta_content(webpage: str, names: tuple[str, ...]) -> str | None:
    for name in names:
        m = re.search(
            r'<meta[^>]+(?:property|name)=["\']%s["\'][^>]+content=["\']([^"\']*)["\']' % re.escape(name),
            webpage,
        ) or re.search(
            r'<meta[^>]+content=["\']([^"\']*)["\'][^>]+(?:property|name)=["\']%s["\']' % re.escape(name),
            webpage,
        )
        if m and m.group(1):
            return _html.unescape(m.group(1))
    return None


def facebook_extract_metadata(webpage: str, video_id: str = "") -> dict:
    """Portable core of the facebook dropin's webpage scrape
    (ref:facebook.py:19-126): data-sjs ScheduledServerJS JSON scan for the
    post payload, title resolution (attachment media title → uiHeaderTitle →
    og:title → twitter:title → <title>), description metas, uploader
    (ownerName / fbPhotoPageAuthorName), data-utime timestamp, thumbnail
    with the unretrievable-URL guard, view counts, and the trailing
    '| Facebook' strip with the 'Facebook video #id' fallback."""
    post_data = []
    for j in _FB_SJS_RE.findall(webpage):
        try:
            post_data.append(json.loads(j))
        except ValueError:
            continue

    def walk(obj, out):
        if isinstance(obj, dict):
            for k, v in obj.items():
                if k == "media" and isinstance(v, dict) and v.get("__typename") == "Video":
                    if not video_id or str(v.get("id")) == str(video_id):
                        out.append(v)
                walk(v, out)
        elif isinstance(obj, list):
            for v in obj:
                walk(v, out)

    media: list[dict] = []
    walk(post_data, media)

    def get_first(dicts, path):
        for d in dicts:
            cur: Any = d
            for p in path:
                cur = cur.get(p) if isinstance(cur, dict) else None
                if cur is None:
                    break
            if cur:
                return cur
        return None

    title = get_first(media, ("title", "text"))
    description = get_first(
        media, ("creation_story", "comet_sections", "message", "story", "message", "text")
    )
    page_title = title
    if not page_title:
        m = _FB_UIHEADER_RE.search(webpage)
        page_title = _html.unescape(m.group(1)) if m else None
    if not page_title:
        page_title = _meta_content(webpage, ("og:title", "twitter:title"))
    if not page_title:
        m = _FB_TITLE_RE.search(webpage)
        page_title = _html.unescape(m.group(1)) if m else None
    description = description or _meta_content(
        webpage, ("description", "og:description", "twitter:description")
    )
    uploader = get_first(media, ("owner", "name"))
    if not uploader:
        m = _FB_AUTHOR_EL_RE.search(webpage)
        uploader = re.sub(r"<[^>]+>", "", m.group(1)).strip() if m else None
    if not uploader:
        m = _FB_OWNER_RE.search(webpage)
        uploader = m.group(1) if m else None
    m = _FB_UTIME_RE.search(webpage)
    timestamp = int(m.group(1)) if m else None
    thumbnail = _meta_content(webpage, ("og:image", "twitter:image"))
    if thumbnail and not re.search(r"\.(?:jpg|png)", thumbnail):
        thumbnail = None  # unretrievable crawler thumbnails (ref:facebook.py:82-85)
    view_count = None
    for rx in _FB_VIEWCOUNT_RES:
        m = rx.search(webpage)
        if m:
            view_count = int(re.sub(r"[,.]", "", m.group(1)))
            break
    final_title = re.sub(r"\s*\|\s*Facebook$", "", title or page_title or "")
    if not final_title:
        final_title = (description or "").replace("\n", " ") or (
            f"Facebook video #{video_id}" if video_id else ""
        )
    return {
        "title": final_title,
        "description": description or "",
        "uploader": uploader or "",
        "timestamp": timestamp,
        "thumbnail": thumbnail or "",
        "view_count": view_count,
    }


def facebook_create_metadata(post: dict, url: str) -> dict:
    """Scraped post dict → normalized row (ref:facebook.py:139-145):
    description as content, title, uploader as author."""
    return {
        "status": "facebook: success",
        "url": url,
        "content": post.get("description", ""),
        "title": post.get("title", ""),
        "author": post.get("uploader", ""),
    }
