"""Behavior-parity tests using the reference suite's own parametrized cases
(ref:tests/utils/test_urls.py, ref:tests/utils/test_deletion_detection.py) —
every (input, expected) pair below is taken verbatim from the reference
tests, run against this engine's kernels."""

import pytest

from auto_archiver_ray.functions import textkit, urlkit

# ref:tests/utils/test_urls.py test_is_auth_wall
AUTH_WALL_CASES = [
    ("https://example.com", False),
    ("https://t.me/c/abc/123", True),
    ("https://t.me/not-private/", False),
    ("https://instagram.com", True),
    ("https://www.instagram.com", True),
    ("https://www.instagram.com/p/INVALID", True),
    ("https://www.instagram.com/p/C4QgLbrIKXG/", True),
]


@pytest.mark.parametrize("url,expected", AUTH_WALL_CASES)
def test_is_auth_wall_parity(url, expected):
    assert urlkit.is_auth_wall(url) == expected


# ref:tests/utils/test_urls.py test_check_url_or_raise
CHECK_CASES = [
    ("http://example.com", True),
    ("https://example.com", True),
    ("ftp://example.com", False),
    ("http://localhost", False),
    ("http://", False),
]


@pytest.mark.parametrize("url,ok", CHECK_CASES)
def test_check_url_parity(url, ok):
    assert urlkit.check_url(url)[0] == ok


# ref:tests/utils/test_urls.py test_domain_for_url
DOMAIN_CASES = [
    ("https://example.com", "example.com"),
    ("https://www.example.com", "www.example.com"),
    ("https://www.example.com/path", "www.example.com"),
    ("https://", ""),
    ("http://localhost", "localhost"),
]


@pytest.mark.parametrize("url,domain", DOMAIN_CASES)
def test_domain_parity(url, domain):
    assert urlkit.domain_for_url(url) == domain


# ref:tests/utils/test_urls.py test_remove_get_parameters
REMOVE_GET_CASES = [
    ("https://example.com", "https://example.com"),
    ("https://example.com?utm_source=example", "https://example.com"),
    ("https://example.com?utm_source=example&other=1", "https://example.com"),
    ("https://example.com/something", "https://example.com/something"),
    ("https://example.com/something?utm_source=example", "https://example.com/something"),
]


@pytest.mark.parametrize("url,expected", REMOVE_GET_CASES)
def test_remove_get_parity(url, expected):
    assert urlkit.remove_get_parameters(url) == expected


# ref:tests/utils/test_urls.py test_is_relevant_url — full case table
RELEVANT_CASES = [
    ("https://example.com", True),
    ("https://example.com/favicon.ico", False),
    ("https://twimg.com/profile_images", False),
    ("https://twimg.com/something/default_profile_images", False),
    ("https://scontent.cdninstagram.com/username/150x150.jpg", False),
    ("https://static.cdninstagram.com/rsrc.php/", False),
    ("https://telegram.org/img/emoji/", False),
    ("https://www.youtube.com/s/gaming/emoji/", False),
    ("https://yt3.ggpht.com/default-user=", False),
    ("https://www.youtube.com/s/search/audio/", False),
    ("https://ok.ru/res/i/", False),
    ("https://vk.com/emoji/", False),
    ("https://vk.com/images/", False),
    ("https://vk.com/images/reaction/", False),
    ("https://wikipedia.org/static", False),
    ("https://example.com/file.svg", False),
    ("https://example.com/file.ico", False),
    ("https://example.com/file.mp4", True),
    ("https://example.com/150x150.jpg", True),
    ("https://example.com/rsrc.php/", True),
    ("https://example.com/img/emoji/", True),
    ("https://styles.redditmedia.com/123", False),
    ("https://emoji.redditmedia.com/abc.jpg", False),
    ("https://example.com/rsrc.m3u8?asdasd=10", False),
    ("https://example.com/rsrc.mpd", False),
    ("https://example.com/rsrc.ism?vid=12", False),
]


@pytest.mark.parametrize("url,expected", RELEVANT_CASES)
def test_is_relevant_parity(url, expected):
    assert urlkit.is_relevant_url(url) == expected


# ref:tests/utils/test_urls.py test_twitter_best_quality_url
TWITTER_CASES = [
    (
        "https://twitter.com/some_image.jpg?name=small&this_is_another=145",
        "https://twitter.com/some_image.jpg?name=orig&this_is_another=145",
    ),
    ("https://twitter.com/some_image.jpg", "https://twitter.com/some_image.jpg"),
    ("https://twitter.com/some_image.jpg?name=orig", "https://twitter.com/some_image.jpg?name=orig"),
]


@pytest.mark.parametrize("url,expected", TWITTER_CASES)
def test_twitter_best_quality_parity(url, expected):
    assert urlkit.twitter_best_quality_url(url) == expected


# ref:tests/utils/test_urls.py test_get_media_url_best_quality — full table
BEST_QUALITY_CASES = [
    (
        "https://pbs.twimg.com/media/abc123?format=jpg&name=small",
        "https://pbs.twimg.com/media/abc123?format=jpg&name=orig",
    ),
    ("https://pbs.twimg.com/media/abc123?name=large", "https://pbs.twimg.com/media/abc123?name=orig"),
    ("https://pbs.twimg.com/media/abc123?format=jpg", "https://pbs.twimg.com/media/abc123?format=jpg"),
    (
        "https://pbs.twimg.com/media/abc123?format=jpg&name=orig",
        "https://pbs.twimg.com/media/abc123?format=jpg&name=orig",
    ),
    ("https://x.com/media/abc123?name=medium", "https://x.com/media/abc123?name=orig"),
    ("https://twimg.com/media/abc123?name=thumb", "https://twimg.com/media/abc123?name=orig"),
    ("https://example.com/media/file.mp4", "https://example.com/media/file.mp4"),
    ("https://example.com/media/file-1280x720.mp4", "https://example.com/media/file.mp4"),
    ("https://example.com/media/file-1920x1080.jpg?foo=bar", "https://example.com/media/file.jpg?foo=bar"),
    ("https://pbs.twimg.com/media/abc-1280x720.jpg?name=small", "https://pbs.twimg.com/media/abc.jpg?name=orig"),
    ("https://example.com/media/file.mp4?foo=bar", "https://example.com/media/file.mp4?foo=bar"),
    ("https://example.com/a/b/c/file-640x480.png", "https://example.com/a/b/c/file.png"),
    ("https://example.com/media-1280x720/file.mp4", "https://example.com/media-1280x720/file.mp4"),
]


@pytest.mark.parametrize("url,expected", BEST_QUALITY_CASES)
def test_best_quality_parity(url, expected):
    assert urlkit.best_quality_url(url) == expected


# ref:tests/utils/test_urls.py test_clean_removes_trackers — full table
CLEAN_CASES = [
    ("https://example.com/page?foo=bar&baz=qux", "https://example.com/page?foo=bar&baz=qux"),
    ("https://example.com/page?utm_source=google&foo=bar", "https://example.com/page?foo=bar"),
    (
        "https://example.com/page?utm_source=google&utm_medium=email&utm_campaign=spring",
        "https://example.com/page",
    ),
    (
        "https://example.com/page?foo=bar&utm_content=abc&baz=qux&gclid=123",
        "https://example.com/page?foo=bar&baz=qux",
    ),
    ("https://example.com/page?utm_source=google&gclid=123", "https://example.com/page"),
    ("https://example.com/page", "https://example.com/page"),
    ("https://example.com/page#utm_source=google", "https://example.com/page#utm_source=google"),
    ("https://example.com/page?utm_source=google#section-1", "https://example.com/page#section-1"),
    ("https://example.com/page?utm_source=&foo=bar", "https://example.com/page?foo=bar"),
    ("https://example.com/page?utm_source=google&utm_source=bing&foo=bar", "https://example.com/page?foo=bar"),
    ("https://example.com/page?utm_source=google%20ads&foo=bar", "https://example.com/page?foo=bar"),
    ("https://example.com/page?utm_sourc=keepme&foo=bar", "https://example.com/page?utm_sourc=keepme&foo=bar"),
]


@pytest.mark.parametrize("url,expected", CLEAN_CASES)
def test_clean_parity(url, expected):
    assert urlkit.clean_url(url) == expected


# ref:tests/utils/test_deletion_detection.py — scan behavior
def test_deletion_twitter_html_parity():
    html_text = "Hmm...this page doesn't exist. Try searching for something else."
    d, ind, src = textkit.detect_deletion(html_text, None, None, urlkit.platform_for_url("https://twitter.com/user/status/123"))
    assert d and src == "html_content" and "page doesn't exist" in ind.lower()


def test_deletion_title_parity():
    d, ind, src = textkit.detect_deletion(None, "Page Not Found", None, urlkit.platform_for_url("https://facebook.com/post/123"))
    assert d and src == "page_title"


def test_deletion_error_parity():
    d, ind, src = textkit.detect_deletion(
        None, None, "yt_dlp.utils.DownloadError: This video is no longer available",
        urlkit.platform_for_url("https://youtube.com/watch?v=abc123"),
    )
    assert d and src == "error_message"


def test_deletion_indicator_membership_parity():
    assert "Hmm...this page doesn't exist" in textkit.DELETION_INDICATORS["twitter"]
    tw = textkit.indicators_for_platform("twitter")
    assert any("page doesn't exist" in i.lower() for i in tw)
    ig = textkit.indicators_for_platform("instagram")
    assert any("page isn't available" in i.lower() for i in ig)
