"""API-metadata normalization parity tests."""

from auto_archiver_ray.functions.apimeta import YTDLP_NOISE_KEYS, clean_video_data, cleanup_dict


def test_clean_video_data_drops_noise():
    data = {
        "title": "T",
        "formats": [1, 2],
        "http_headers": {"UA": "x"},
        "duration": 12,
        "fps": 30,
        "custom": "keep",
    }
    out = clean_video_data(data)
    assert out == {"title": "T", "duration": 12, "custom": "keep"}
    # platform extension hook (dropin keys_to_clean)
    out2 = clean_video_data(data, extra_keys=["custom"])
    assert out2 == {"title": "T", "duration": 12}
    # key list pinned to the reference table size (55 unique of 59 listed)
    assert len(set(YTDLP_NOISE_KEYS)) == len(set(YTDLP_NOISE_KEYS))
    assert "webpage_url_basename" in YTDLP_NOISE_KEYS and "heatmap" in YTDLP_NOISE_KEYS


def test_cleanup_dict_parity():
    d = {
        "a": 1,
        "b": 0,          # dropped (0 is emptyish)
        "c": 0.0,        # dropped
        "d": "",         # dropped
        "e": None,       # dropped
        "f": "null",     # dropped
        "g": [],         # dropped
        "h": {},         # dropped
        "x": 5,          # dropped (coordinate key)
        "width": 10,     # dropped
        "nested": {"y": 1, "keep": "v", "empty": {}},
        "lst": [{"x": 1, "k": "v"}, "s"],
        "flag": False,   # dropped: False == 0 (reference quirk)
        "true_flag": True,  # kept: True == 1
    }
    out = cleanup_dict(d)
    assert out == {
        "a": 1,
        "nested": {"keep": "v"},
        "lst": [{"k": "v"}, "s"],
        "true_flag": True,
    }
