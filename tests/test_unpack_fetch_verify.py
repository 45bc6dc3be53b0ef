"""Recursive unpack (visited-set), rate-limited fetch collector,
key store + DSSE verifier, pagination."""

import json
import time

import pandas as pd
import pytest


class TestUnpack:
    def _ds(self, rows):
        import ray.data as rd

        return rd.from_pandas(pd.DataFrame(rows, columns=["doc_id", "payload"]))

    def test_nested_tree_explodes_to_leaves(self, ray_session):
        from guac_ray.sources.unpack import unpack_documents

        doc = {
            "format": "bundle",
            "children": [
                {"format": "spdx", "blob": "leaf-a"},
                {"format": "bundle", "children": [
                    {"format": "cdx", "blob": "leaf-b"},
                    {"format": "cdx", "blob": "leaf-c"},
                ]},
            ],
        }
        out = unpack_documents(self._ds([("d1", json.dumps(doc))])).to_pandas()
        leaves = out[out.status == "leaf"]
        assert sorted(leaves.blob) == ["leaf-a", "leaf-b", "leaf-c"]
        assert leaves.depth.max() == 2

    def test_cycle_guard_skips_repeated_blob(self, ray_session):
        from guac_ray.sources.unpack import unpack_documents

        inner = {"format": "cdx", "blob": "same"}
        doc = {"format": "bundle", "children": [inner, inner, {"format": "x", "blob": "y"}]}
        out = unpack_documents(self._ds([("d1", json.dumps(doc))])).to_pandas()
        assert (out.status == "leaf").sum() == 2          # 'same' emitted once
        assert (out.status == "cycle_skipped").sum() == 1

    def test_malformed_routes_to_reject(self, ray_session):
        from guac_ray.sources.unpack import unpack_documents

        out = unpack_documents(self._ds([("d1", "{not json")])).to_pandas()
        assert list(out.status) == ["reject"]

    def test_depth_bound(self, ray_session):
        from guac_ray.sources.unpack import unpack_documents

        doc: dict = {"format": "leafish", "blob": "bottom"}
        for _ in range(12):
            doc = {"format": "bundle", "children": [doc]}
        out = unpack_documents(self._ds([("d1", json.dumps(doc))]),
                               max_depth=4).to_pandas()
        # the node AT the depth bound emits as a leaf-with-children
        # (truncated) rather than recursing forever
        assert out.depth.max() == 4


def _make_transport():
    # defined as a closure so Ray pickles it BY VALUE — a module-level
    # function in a pytest-rewritten test module hangs worker-side import
    def fake_transport(ident: str) -> bytes:
        if ident.endswith("bad"):
            raise ValueError("synthetic fetch failure")
        return f"payload-for-{ident}".encode()

    return fake_transport


class TestFetcher:
    def test_fetches_and_routes_errors(self, ray_session):
        import ray.data as rd

        from guac_ray.sources.fetcher import collect_fetch

        ids = [f"pkg{i}" for i in range(6)] + ["pkg-bad"]
        ds = rd.from_pandas(pd.DataFrame({"identifier": ids}))
        out = collect_fetch(ds, _make_transport(), rate_per_sec=1000.0,
                            concurrency=(1, 1)).to_pandas()
        assert len(out) == 7
        ok = out[out.ok]
        assert len(ok) == 6
        assert set(ok.payload) == {f"payload-for-pkg{i}".encode() for i in range(6)}
        bad = out[~out.ok]
        assert "synthetic fetch failure" in bad.error.iloc[0]

    def test_rate_limit_enforced(self, ray_session):
        import ray.data as rd

        from guac_ray.sources.fetcher import collect_fetch

        n, rate, burst = 12, 20.0, 2
        ds = rd.from_pandas(pd.DataFrame({"identifier": [f"x{i}" for i in range(n)]}))
        t0 = time.time()
        collect_fetch(ds, _make_transport(), rate_per_sec=rate, burst=burst,
                      concurrency=(1, 1), batch_size=n).materialize()
        elapsed = time.time() - t0
        # (n - burst) tokens must be waited for at `rate`/s
        assert elapsed >= (n - burst) / rate * 0.8

    def test_requires_transport(self):
        from guac_ray.sources.fetcher import RateLimitedFetcher

        with pytest.raises(ValueError):
            RateLimitedFetcher(None)


class TestKeyStoreAndVerifier:
    def test_keystore_crud_and_snapshot(self, tmp_path):
        from guac_ray.state.keys import InMemoryKeyStore

        ks = InMemoryKeyStore()
        ks.store("k1", b"secret-1")
        ks.store("k2", b"secret-2")
        assert ks.retrieve("k1") == b"secret-1"
        assert ks.delete("k2") and ks.retrieve("k2") is None
        p = str(tmp_path / "keys.parquet")
        ks.to_parquet(p)
        ks2 = InMemoryKeyStore.from_parquet(p)
        assert ks2.retrieve("k1") == b"secret-1"

    def test_provider_registry(self):
        from guac_ray.state.keys import InMemoryKeyStore, get_key_provider

        assert get_key_provider("inmemory") is InMemoryKeyStore
        with pytest.raises(KeyError):
            get_key_provider("sigstore")

    def test_verify_roundtrip_and_tamper(self, ray_session):
        import ray.data as rd

        from guac_ray.stages.verifier import sign_envelope, verify_envelopes
        from guac_ray.state.keys import InMemoryKeyStore

        ks = InMemoryKeyStore({"kid-1": b"topsecret"})
        good = sign_envelope("application/vnd.in-toto+json", b'{"a":1}',
                             "kid-1", b"topsecret")
        tampered = json.loads(good)
        import base64

        tampered["payload"] = base64.b64encode(b'{"a":2}').decode()
        unknown = sign_envelope("t", b"x", "kid-9", b"whatever")

        ds = rd.from_pandas(pd.DataFrame({
            "doc_id": ["good", "tampered", "unknown", "garbage"],
            "envelope": [good, json.dumps(tampered), unknown, "{oops"],
        }))
        out = verify_envelopes(ds, ks).to_pandas().set_index("doc_id")
        assert bool(out.loc["good"].verified)
        assert not bool(out.loc["tampered"].verified)
        assert out.loc["unknown"].error == "unknown key id"
        assert out.loc["garbage"].error.startswith("bad envelope")
        assert out.loc["good"].payload_digest.startswith("sha256:")


class TestPaginate:
    def test_pages_are_disjoint_and_ordered(self, ray_session):
        import ray.data as rd

        from guac_ray.query.graph import paginate

        df = pd.DataFrame({"k": list(range(37))})
        ds = rd.from_pandas(df.sample(frac=1, random_state=7)).repartition(4)
        pages = [
            paginate(ds, ["k"], offset=o, limit=10).to_pandas().k.tolist()
            for o in (0, 10, 20, 30)
        ]
        assert pages[0] == list(range(10))
        assert pages[3] == list(range(30, 37))
        assert sum(len(p) for p in pages) == 37

    def test_validation(self, ray_session):
        import ray.data as rd

        from guac_ray.query.graph import paginate

        with pytest.raises(ValueError):
            paginate(rd.range(5), ["id"], offset=-1)
