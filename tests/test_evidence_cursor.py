"""Tests: timestamping hash-chain manifests, cursor-paginated source,
instagram scrape kernels, exiftool extraction stage."""

import pandas as pd
import pytest

from auto_archiver_ray.functions import apimeta
from auto_archiver_ray.sources import cursor as cursrc
from auto_archiver_ray.stages import evidence
from auto_archiver_ray.stages.enrich import ExifToolStage, parse_exiftool_output


# ---------------------------------------------------------------- evidence

def test_manifest_build_and_verify():
    hashes = ["SHA-256:aa11", "SHA3-512:bb22", "cc33"]
    manifest = evidence.build_manifest(hashes)
    assert manifest == "aa11\nbb22\ncc33"  # prefixes stripped (ref::55-57)
    assert evidence.verify_manifest(manifest, hashes)
    assert not evidence.verify_manifest(manifest + "x", hashes)
    tok = evidence.stub_tsa_token("dtsa://alpha.invalid/tsr", manifest)
    assert evidence.verify_token("dtsa://alpha.invalid/tsr", manifest, tok)
    assert not evidence.verify_token("dtsa://beta.invalid/tsr", manifest, tok)


@pytest.mark.usefixtures("ray_session")
def test_hash_manifests_dataset():
    import ray.data as rd

    df = pd.DataFrame(
        {
            "host": ["a", "a", "b"],
            "sha256": ["SHA-256:h1", "SHA-256:h2", "SHA-256:h3"],
            "url": ["https://a/2", "https://a/1", "https://b/1"],
        }
    )
    out = (
        evidence.hash_manifests(rd.from_pandas(df), hash_col="sha256")
        .to_pandas()
        .sort_values("host")
        .reset_index(drop=True)
    )
    assert list(out["host"]) == ["a", "b"]
    assert list(out["n_hashes"]) == [2, 1]
    # host a ordered by url: h2 (url .../1) then h1
    assert out["manifest_sha256"][0] == evidence.manifest_sha256("h2\nh1")
    assert out["token_0"][0] == evidence.stub_tsa_token(
        evidence.DEFAULT_TSA_URLS[0], "h2\nh1"
    )


# ------------------------------------------------------------------ cursor

def _items():
    base = [
        {"id": i, "source_url": f"https://s.example.org/p/{i}", "visibility": "visible",
         "status": "ready", "metadata": {}}
        for i in range(10)
    ]
    base[2]["visibility"] = "hidden"                       # filtered
    base[3]["status"] = "processing"                       # filtered
    base[4]["metadata"] = {"auto_archiver": {"processed": True}}  # filtered
    base[5]["source_url"] = ""                             # filtered
    return base


def test_admission_filter_matches_reference():
    admitted = [i["id"] for i in _items() if cursrc.atlos_item_admissible(i)]
    assert admitted == [0, 1, 6, 7, 8, 9]


@pytest.mark.usefixtures("ray_session")
def test_cursor_epochs_and_write_back():
    import ray.data as rd

    fetch_page, post_result, posted = cursrc.make_stub_service(_items(), page_size=3)
    epochs = list(cursrc.cursor_epochs(fetch_page, epoch_size=4))
    rows = [r for ds, _ in epochs for r in ds.take_all()]
    assert [r["atlos_id"] for r in rows] == [0, 1, 6, 7, 8, 9]
    assert len(epochs) == 2  # 4 + 2
    # resume cursor of the first epoch re-reads from the start of its page run
    first_resume = epochs[0][1]
    assert first_resume is None  # epoch 0 started from the beginning
    # ADVICE r2: epoch 1 starts mid-page (ids 8,9; page [6,7,8] fetched at
    # cursor 6) — its resume cursor must be the PAGE-START cursor 6, not the
    # after-page cursor 9 which would lose id 8 on restart
    assert epochs[1][1] == 6
    replayed = [r["atlos_id"] for r, _ in cursrc.drain_cursor(fetch_page, epochs[1][1])]
    assert set(replayed) >= {8, 9}  # epoch 1 fully reachable from its cursor

    # write-back: success statuses → processed/success, others → error.
    # The sink runs in Ray workers, so the ledger must be an actor (a plain
    # driver-side dict would only mutate the workers' pickled copies).
    import ray

    @ray.remote
    class Ledger:
        def __init__(self):
            self.posted = {}

        def post(self, item_id, payload):
            self.posted[item_id] = payload

        def get(self):
            return self.posted

    ledger = Ledger.remote()

    def remote_post(item_id, payload):
        ray.get(ledger.post.remote(item_id, payload))

    res = rd.from_items(
        [
            {"atlos_id": 0, "status": "generic: success"},
            {"atlos_id": 1, "status": "nothing archived"},
            {"atlos_id": "", "status": "generic: success"},  # no id → skipped
        ]
    )
    total = cursrc.results_write_back(res, remote_post).sum("n_posted")
    assert total == 2
    posted_remote = ray.get(ledger.get.remote())
    assert posted_remote[0] == {"processed": True, "status": "success"}
    assert posted_remote[1] == {"processed": True, "status": "error"}


# --------------------------------------------------------------- instagram

def test_instagram_scrape_media_video_over_image():
    item = {
        "id": "99", "code": "Cxyz", "taken_at": 1700000000,
        "caption_text": "hello", "thumbnail_url": "https://cdn/t.jpg",
        "video_url": "https://cdn/v.mp4",
        "image_versions2": {"candidates": []},  # minimized away
        "like_count": 0,  # cleaned (falsy)
    }
    cleaned, media, media_id = apimeta.instagram_scrape_media(item, None)
    assert media["kind"] == "video"
    assert media["media_url"] == "https://cdn/v.mp4"
    assert media["preview_url"] == "https://cdn/t.jpg"
    assert media["url"] == "https://www.instagram.com/p/Cxyz"
    assert media["text"] == "hello"
    assert media_id == "video 99"
    assert "image_versions2" not in cleaned and "like_count" not in cleaned


def test_instagram_scrape_item_carousel():
    item = {
        "pk": "1", "code": "Cmain",
        "thumbnail_url": "https://cdn/main.jpg",
        "carousel_media": [
            {"pk": "2", "thumbnail_url": "https://cdn/r1.jpg"},
            {"pk": "3", "thumbnail_url": "https://cdn/r2.jpg"},
        ],
        "clips_metadata": {"reusable_text_attribute_string": "clip text"},
    }
    out = apimeta.instagram_scrape_item(item)
    assert out["url"] == "https://www.instagram.com/p/Cmain/"
    assert out["media"]["media_url"] == "https://cdn/main.jpg"
    assert out["item"]["clips_metadata_text"] == "clip text"
    assert "clips_metadata" not in out["item"]
    assert [m["media_url"] for m in out["other_media"]] == ["https://cdn/r1.jpg", "https://cdn/r2.jpg"]

    with pytest.raises(AssertionError):
        apimeta.instagram_scrape_item({"pk": "7"})  # no media anywhere


def test_instagram_main_media_from_first_resource():
    item = {"pk": "1", "resources": [{"pk": "2", "thumbnail_url": "https://cdn/r.jpg"}]}
    out = apimeta.instagram_scrape_item(item)
    assert out["media"]["media_url"] == "https://cdn/r.jpg"
    assert out["other_media"] == []


# ---------------------------------------------------------------- exiftool

def test_parse_exiftool_output():
    txt = "File Size    : 12 kB\nMIME Type: image/jpeg\n"
    assert parse_exiftool_output(txt) == {"File Size": "12 kB", "MIME Type": "image/jpeg"}
    # malformed line → reference's try/except returns {}
    assert parse_exiftool_output("no colon here") == {}


@pytest.mark.usefixtures("ray_session")
def test_exiftool_stage_fallback_and_baskets():
    import json

    import pyarrow as pa
    import ray.data as rd

    tbl = pa.table({"payload": pa.array([b"\xff\xd8\xffrest", b"\x89PNGrest"], pa.binary())})
    out = rd.from_arrow(tbl).map_batches(
        ExifToolStage, batch_format="pyarrow", concurrency=1
    ).to_pandas()
    metas = [json.loads(s) for s in out["exif_json"]]
    assert metas[0]["File Type"] == "JPEG" and metas[0]["MIME Type"] == "image/jpeg"
    assert metas[1]["File Type"] == "PNG"
    assert "File Size" in metas[0]


@pytest.mark.usefixtures("ray_session")
def test_file_tokens_per_row():
    import ray.data as rd

    df = pd.DataFrame({"sha256": ["SHA-256:aa", "bb", ""]})
    out = evidence.file_tokens(rd.from_pandas(df)).to_pandas()
    assert out["ots_token_0"][0] == evidence.stub_tsa_token(evidence.DEFAULT_TSA_URLS[0], "aa")
    assert out["ots_token_0"][1] == evidence.stub_tsa_token(evidence.DEFAULT_TSA_URLS[0], "bb")
    assert out["ots_token_0"][2] == ""
    assert evidence.verify_token(evidence.DEFAULT_TSA_URLS[1], "aa", out["ots_token_1"][0])


# ------------------------------------------------------------- instaloader


def test_instagram_url_kind_post_before_profile():
    """Routing parity (intended semantics of ref::24-29; the reference's
    literal composition interpolates a COMPILED regex into a format string,
    so its own patterns can never match — quirk documented in apimeta)."""
    assert apimeta.instagram_url_kind("https://www.instagram.com/p/CXyz12/") == ("post", "CXyz12")
    assert apimeta.instagram_url_kind("https://instagram.com/reel/AbC9/") == ("post", "AbC9")
    assert apimeta.instagram_url_kind("http://instagr.am/p/Q1w2e3") == ("post", "Q1w2e3")
    assert apimeta.instagram_url_kind("https://www.instagram.com/bellingcat") == (
        "profile",
        "bellingcat",
    )
    assert apimeta.instagram_url_kind("https://example.org/p/nope") == ("", "")


def test_instaloader_media_plan_contract():
    """process_downloads parity (ref::147-158): txt sidecars dropped,
    a SINGLE media file fails (the reference's `assert len > 1`), survivors
    sorted by filename descending."""
    files = [
        "2024-01-01_UTC_user__GraphImage.jpg",
        "2024-01-01_UTC_user__GraphImage.txt",
        "2024-01-02_UTC_user__GraphVideo.mp4",
    ]
    assert apimeta.instaloader_media_plan(files) == [
        "2024-01-02_UTC_user__GraphVideo.mp4",
        "2024-01-01_UTC_user__GraphImage.jpg",
    ]
    assert apimeta.instaloader_media_plan(["one.jpg"]) == []  # single file → failure
    assert apimeta.instaloader_media_plan(["one.jpg", "note.txt"]) == []


def test_instaloader_metadata_assembly():
    node = {"shortcode": "CXyz12", "owner": "user"}
    out = apimeta.instaloader_metadata(
        "https://www.instagram.com/p/CXyz12/", "a title", node, "2024-01-05",
        ["b.jpg", "a.jpg", "x.txt"],
    )
    assert out["status"] == "instagram: success"
    assert out["content"] == str(node)
    assert out["media"] == ["b.jpg", "a.jpg"]
    assert apimeta.instaloader_metadata("u", "t", {}, None, ["only.jpg"]) is None


def test_instaloader_profile_contract():
    t = apimeta.instaloader_profile_targets("alice")
    assert t == {
        "post": "profile_post_alice",
        "tagged": "tagged_post_alice",
        "igtv": "igtv_post_alice",
        "story": "story_item_alice",
        "highlight": "highlight_item_alice",
    }
    assert apimeta.instaloader_post_title("https://www.instagram.com/alice", None, "alice") == "@alice"
    assert (
        apimeta.instaloader_post_title("https://www.instagram.com/p/C1/", "hello", "alice")
        == "hello"
    )


def test_tbot_collect_protocol():
    """Message-fold parity (ref::104-126): filler skipped wholly (even its
    media), newest-first text concatenation, media dedup by post id,
    since_id advances to the max seen."""
    posts = [
        {"id": 9, "message": "part2", "media": True},
        {"id": 8, "message": apimeta.TBOT_FILLER + " details", "media": True},  # filler
        {"id": 7, "message": "part1", "media": False},
        {"id": 5, "message": "", "media": True},
    ]
    msg, keys, since, seen = apimeta.tbot_collect(posts, chat_id=42, since_id=4)
    assert msg == "part2part1"
    assert keys == ["42_9", "42_5"]  # filler's media (id 8) skipped
    assert since == 9
    # second attempt with overlapping posts: seen media not re-downloaded
    msg2, keys2, since2, _ = apimeta.tbot_collect(
        [{"id": 9, "message": "", "media": True}, {"id": 11, "message": "x", "media": True}],
        chat_id=42, since_id=since, seen_media=seen,
    )
    assert keys2 == ["42_11"] and msg2 == "x" and since2 == 11


def test_tbot_outcome_decision_tree():
    assert apimeta.tbot_outcome("You must enter a URL to a post", 3) is None
    assert apimeta.tbot_outcome("Media not found or unavailable", 0) is None
    ok = apimeta.tbot_outcome("  hello world  ", 1)
    assert ok == {"content": "hello world", "title": "hello world", "status": "insta-via-bot: success"}
    long = "x" * 300
    assert apimeta.tbot_outcome(long, 0)["title"] == "x" * 128
    assert apimeta.tbot_outcome("", 2)["status"] == "insta-via-bot: success"
    assert apimeta.tbot_outcome("", 0) is None
