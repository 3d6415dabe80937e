import numpy as np
import pytest

from regard3d_tpu import native
from regard3d_tpu.sfm import tracks


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no compiler)")
    return lib


def test_union_find_matches_python(lib, rng):
    n = 5000
    edges = rng.integers(0, n, size=(20000, 2)).astype(np.int64)
    labels = native.union_find(edges, n)
    ref = tracks._connected_components(n, edges[:, 0], edges[:, 1])
    _, ref = np.unique(ref, return_inverse=True)
    # same partition (label values may differ): compare co-membership via
    # canonical relabeling by first occurrence
    def canon(l):
        seen = {}
        out = np.empty_like(l)
        for i, v in enumerate(l):
            out[i] = seen.setdefault(v, len(seen))
        return out
    np.testing.assert_array_equal(canon(labels), canon(ref))


def test_union_find_chain(lib):
    edges = np.stack([np.arange(99), np.arange(1, 100)], -1).astype(np.int64)
    labels = native.union_find(edges, 100)
    assert (labels == labels[0]).all()


def test_union_find_out_of_range_edges_ignored(lib):
    edges = np.asarray([[0, 1], [5, 900], [-3, 2]], np.int64)
    labels = native.union_find(edges, 6)
    assert labels[0] == labels[1]
    assert labels[5] != labels[0]


def test_parse_feats_roundtrip(lib, tmp_path, rng):
    p = str(tmp_path / "x.feat")
    data = rng.uniform(-10, 1000, size=(321, 4)).astype(np.float32)
    with open(p, "w") as f:
        for row in data:
            f.write(f"{row[0]:.6g} {row[1]:.6g} {row[2]:.6g} {row[3]:.6g}\n")
    out = native.parse_feats(p)
    np.testing.assert_allclose(out, data, rtol=1e-5)


def test_parse_feats_empty(lib, tmp_path):
    p = str(tmp_path / "empty.feat")
    open(p, "w").close()
    out = native.parse_feats(p)
    assert out.shape == (0, 4)


def test_tracks_builder_uses_native(lib):
    matches = {(0, 1): np.asarray([[0, 5], [1, 6]]),
               (1, 2): np.asarray([[5, 9]])}
    t = tracks.build_tracks(matches)
    assert t.num_tracks == 2
