"""Property-based robustness tests (hypothesis) for the pure-function
kernels added in round 5: the JPEG/PNG codecs and the URL normalizer.
Ray-free — structural invariants over generated inputs, complementing
the golden/round-trip cases in test_pipelines.py."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from open_source_search_engine_ray.functions.jpeg import (
    decode_jpeg, encode_jpeg)
from open_source_search_engine_ray.functions.urlnorm import (
    domain_of, normalize_url, parse_url)
from open_source_search_engine_ray.pipelines.multimodal import (
    decode_png, encode_png)

dims = st.integers(min_value=1, max_value=40)


@settings(max_examples=25, deadline=None)
@given(h=dims, w=dims, ch=st.sampled_from([1, 3]),
       q=st.integers(min_value=30, max_value=95),
       sub=st.sampled_from(["444", "420"]),
       dri=st.integers(min_value=0, max_value=3),
       seed=st.integers(min_value=0, max_value=2**31 - 1))
def test_jpeg_roundtrip_structure(h, w, ch, q, sub, dri, seed):
    """Any uint8 image, any supported profile: decode(encode(x)) keeps
    shape/dtype, and a uniform image reconstructs near-exactly (DC-only
    blocks; chroma means are exact under 4:2:0 box downsampling)."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, ch), np.uint8)
    if ch == 1:
        img = img[:, :, 0]
    payload = encode_jpeg(img, quality=q, subsampling=sub,
                          restart_interval=dri)
    out = decode_jpeg(payload)
    assert out.shape == (h, w, 3 if ch == 3 else 1)
    assert out.dtype == np.uint8

    flat = np.full((h, w, ch) if ch == 3 else (h, w),
                   128, np.uint8)
    out2 = decode_jpeg(encode_jpeg(flat, quality=q, subsampling=sub,
                                   restart_interval=dri))
    assert int(np.abs(out2.astype(int) - 128).max()) <= 1


@settings(max_examples=40, deadline=None)
@given(h=dims, w=dims, ch=st.sampled_from([1, 2, 3, 4]),
       seed=st.integers(min_value=0, max_value=2**31 - 1))
def test_png_roundtrip_exact(h, w, ch, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (h, w, ch), np.uint8)
    assert (decode_png(encode_png(px)) == px).all()


_url_host = st.from_regex(r"[A-Za-z0-9](\.[A-Za-z0-9]{1,6}){0,3}",
                          fullmatch=True)
_url_path = st.from_regex(r"(/(\.\.|\.|%7E|[A-Za-z0-9_%61-]{0,8})){0,5}",
                          fullmatch=True)


@settings(max_examples=80, deadline=None)
@given(scheme=st.sampled_from(["http", "HTTP", "https", ""]),
       host=_url_host,
       port=st.sampled_from(["", ":80", ":443", ":8080", ":0", ":bad"]),
       path=_url_path,
       frag=st.sampled_from(["", "#x"]))
def test_normalize_url_idempotent(scheme, host, port, path, frag):
    """normalize(normalize(u)) == normalize(u) for generated URLs across
    schemes, ports (incl. malformed), dot-segment paths and fragments;
    the canonical host is lowercase ASCII with no trailing dot."""
    u = (f"{scheme}://{host}{port}{path}{frag}" if scheme
         else f"{host}{port}{path}{frag}")
    n = normalize_url(u)
    assert normalize_url(n) == n
    d = parse_url(n)
    assert d["host"] == d["host"].lower()
    assert not d["host"].endswith(".")
    assert d["host"].isascii()
    assert d["path"].startswith("/") and "/../" not in d["path"] + "/"
    labels = d["host"].split(".")
    want = ".".join(labels[-2:]) if len(labels) >= 2 else d["host"]
    assert domain_of(d["host"]) == want
