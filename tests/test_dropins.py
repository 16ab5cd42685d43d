"""Platform dropin parse-kernel parity tests (tiktok/bluesky/truth/facebook),
mirroring the behaviors of ref:modules/generic_extractor/{tiktok,bluesky,
truth,facebook}.py on hand-built payloads."""

import pytest

from auto_archiver_ray.functions import dropins


# ------------------------------------------------------------------- tiktok

def test_tiktok_suitable():
    assert dropins.tiktok_suitable("https://www.tiktok.com/@user/video/123")
    assert dropins.tiktok_suitable("https://vm.tiktok.com/ZMabc/")
    assert dropins.tiktok_suitable("https://www.tiktok.com/@a.b-c/photo/999")
    assert not dropins.tiktok_suitable("https://example.org/watch")


def test_tiktok_extract_post_play_selection():
    # prefers non-watermarked 'play'
    post = dropins.tiktok_extract_post(
        {"msg": "success", "data": {"play": "https://cdn/p.mp4", "wmplay": "https://cdn/w.mp4", "id": "1"}}
    )
    assert post["video_url"] == "https://cdn/p.mp4"
    # falls back to wmplay
    post = dropins.tiktok_extract_post({"msg": "success", "data": {"wmplay": "https://cdn/w.mp4"}})
    assert post["video_url"] == "https://cdn/w.mp4"
    # audio-mime play urls rejected
    post = dropins.tiktok_extract_post(
        {"msg": "success", "data": {"play": "https://cdn/a?mime_type=audio_mpeg", "title": "t"}}
    )
    assert "video_url" not in post
    with pytest.raises(ValueError):
        dropins.tiktok_extract_post({"msg": "error"})
    with pytest.raises(ValueError):
        dropins.tiktok_extract_post({"msg": "success", "data": {}})


def test_tiktok_create_metadata():
    post = {
        "video_url": "https://cdn/v.mp4",
        "origin_cover": "https://cdn/oc.jpg",
        "cover": "https://cdn/c.jpg",
        "title": "My video",
        "create_time": 1700000000,
        "author": {"unique_id": "user1"},
        "duration": 12,
        "play_count": 5,
        "is_ad": False,  # empty-ish value → dropped from api_data
        "id": "42",
    }
    out = dropins.tiktok_create_metadata(post)
    assert out["success"] is True
    # origin_cover preferred over cover; video present
    assert out["media_links"] == ["https://cdn/oc.jpg", "https://cdn/v.mp4"]
    assert out["title"] == "My video"
    assert out["timestamp"].startswith("2023-11-14T22:13:20")
    assert out["duration"] == 12
    assert out["api_data"] == {"play_count": 5, "id": "42"}  # falsy values dropped

    # images post without video is a success; no media at all is not
    imgs = dropins.tiktok_create_metadata({"images": ["https://cdn/1.jpg"], "title": "t"})
    assert imgs["success"] and imgs["media_links"] == ["https://cdn/1.jpg"]
    none = dropins.tiktok_create_metadata({"title": "t"})
    assert not none["success"]


# ------------------------------------------------------------------ bluesky

_BSKY_POST = {
    "author": {"did": "did:plc:abc", "handle": "u.bsky.social", "labels": [], "associated": {"x": 1}},
    "record": {
        "text": "hello world",
        "createdAt": "2024-05-01T10:00:00Z",
        "embed": {
            "images": [{"image": {"ref": {"$link": "cid1"}}}],
            "media": {"images": [{"image": {"ref": {"$link": "cid2"}}}], "video": {"ref": {"$link": "cid3"}}},
        },
        "facets": [
            {"features": [{"$type": "app.bsky.richtext.facet#mention", "did": "did:plc:m1"}]},
            {"features": [{"$type": "app.bsky.richtext.facet#tag", "tag": "osint"}]},
            {"features": [{"$type": "app.bsky.richtext.facet#link", "uri": "https://ex.org"}]},
        ],
    },
}


def test_bluesky_embeds_and_post_data():
    urls = dropins.bluesky_embed_urls(_BSKY_POST)
    assert urls == [
        "https://bsky.social/xrpc/com.atproto.sync.getBlob?cid=cid1&did=did:plc:abc",
        "https://bsky.social/xrpc/com.atproto.sync.getBlob?cid=cid2&did=did:plc:abc",
        "https://bsky.social/xrpc/com.atproto.sync.getBlob?cid=cid3&did=did:plc:abc",
    ]
    data = dropins.bluesky_post_data(_BSKY_POST)
    assert data["author"] == {"did": "did:plc:abc", "handle": "u.bsky.social"}  # labels/associated dropped
    assert data["mentions"] == ["did:plc:m1"]
    assert data["tags"] == ["osint"]
    assert data["links"] == ["https://ex.org"]

    meta = dropins.bluesky_create_metadata(_BSKY_POST, "https://bsky.app/profile/u/post/1")
    assert meta["title"] == "hello world"
    assert meta["timestamp"] == "2024-05-01T10:00:00Z"
    assert len(meta["media_links"]) == 3


def test_bluesky_author_labels_kept_when_nonempty():
    post = {"author": {"did": "d", "labels": [{"val": "x"}]}, "record": {"text": "t", "createdAt": "2024-01-01"}}
    assert dropins.bluesky_post_data(post)["author"]["labels"] == [{"val": "x"}]


# -------------------------------------------------------------------- truth

def test_truth_create_metadata():
    post = {
        "created_at": "2022-12-29T19:51:18.161Z",
        "content": "<p>Pele has died.</p>",
        "account": {
            "username": "bbcnewa", "display_name": "BBC News",
            "followers_count": 1131, "following_count": 3, "statuses_count": 9,
        },
        "replies_count": 1, "reblogs_count": 0, "favourites_count": 2,
        "language": "en",
        "media_attachments": [{"id": "m1", "url": "https://cdn/truth1.jpg"}],
    }
    out = dropins.truth_create_metadata(post, "https://truthsocial.com/@bbcnewa/109598702184774628")
    assert out["author"] == "bbcnewa"
    assert out["description"] == "<p>Pele has died.</p>"
    assert out["timestamp"].startswith("2022-12-29T19:51:18")
    # tuple keys flatten to space-joined names (ref:truth.py:53-57)
    assert out["account followers_count"] == 1131
    assert out["account display_name"] == "BBC News"
    assert out["replies_count"] == 1
    assert out["in_reply_to_account"] is None
    assert out["media_links"] == ["https://cdn/truth1.jpg"]


# ----------------------------------------------------------------- facebook

def test_facebook_url_routing():
    assert dropins.facebook_suitable("https://www.facebook.com/user/posts/123")
    assert dropins.facebook_suitable("https://m.facebook.com/story.php?id=1")
    assert not dropins.facebook_suitable("https://example.org/")
    assert dropins.facebook_post_id("https://www.facebook.com/user/posts/pfbid0AbCd123") == "pfbid0AbCd123"
    assert dropins.facebook_post_id("https://www.facebook.com/watch?v=100123") == "100123"
    assert dropins.facebook_skip_ytdlp("https://www.facebook.com/photo/t.123/456")
    assert not dropins.facebook_skip_ytdlp("https://www.facebook.com/watch?v=100123")


def test_facebook_extract_metadata_meta_fallbacks():
    page = (
        "<html><head>"
        '<meta property="og:title" content="A post title | Facebook">'
        '<meta property="og:description" content="Some description">'
        '<meta property="og:image" content="https://scontent/img.jpg">'
        "</head><body>"
        '<abbr data-utime="1700000000" class="t">x</abbr>'
        'ownerName : "Jane Doe"'
        "<div>viewCount : \"1,234\"</div>"
        "</body></html>"
    )
    out = dropins.facebook_extract_metadata(page, "99")
    assert out["title"] == "A post title"  # "| Facebook" stripped
    assert out["description"] == "Some description"
    assert out["uploader"] == "Jane Doe"
    assert out["timestamp"] == 1700000000
    assert out["thumbnail"] == "https://scontent/img.jpg"
    assert out["view_count"] == 1234


def test_facebook_unretrievable_thumbnail_and_fallback_title():
    page = (
        '<html><head><meta property="og:image" content="https://lookaside.fbsbx.com/crawler/media/?media_id=1&get_thumbnail=1">'
        "</head><body></body></html>"
    )
    out = dropins.facebook_extract_metadata(page, "77")
    assert out["thumbnail"] == ""  # no .jpg/.png → dropped (ref:facebook.py:82-85)
    assert out["title"] == "Facebook video #77"


def test_facebook_sjs_media_title():
    import json

    payload = {
        "x": "ScheduledServerJS",
        "require": [{"__bbox": {"result": {"data": {
            "attachments": [{"media": {"__typename": "Video", "id": "55",
                                        "title": {"text": "SJS video title"},
                                        "owner": {"name": "Owner X", "id": "9"}}}]
        }}}}],
    }
    page = f'<script data-sjs>{json.dumps(payload)}</script>'
    out = dropins.facebook_extract_metadata(page, "55")
    assert out["title"] == "SJS video title"
    assert out["uploader"] == "Owner X"

    meta = dropins.facebook_create_metadata(out, "https://www.facebook.com/v/55")
    assert meta["title"] == "SJS video title"
    assert meta["author"] == "Owner X"
    assert meta["status"] == "facebook: success"


def test_facebook_parser_in_chain():
    from auto_archiver_ray.stages.extract import extract_one

    html = (
        "<html><head><title>Chain title | Facebook</title></head>"
        '<body><abbr data-utime="1700000300">t</abbr><p>Body text here.</p></body></html>'
    ).encode()
    out = extract_one("https://www.facebook.com/user/posts/123", "facebook", html)
    assert out["status"] == "facebook: success"
    assert out["title"] == "Chain title"
    assert out["timestamp"].startswith("2023-11-14T22:18:20")
