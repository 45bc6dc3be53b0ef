"""DSSE-envelope signature verification as an actor-pool stage
(reference: pkg/ingestor/verifier/ — the sigstore/DSSE verifier parses
an envelope, resolves keys by id, verifies each signature over the
PAE-encoded payload, and returns the identities that verified).

The envelope format and PAE pre-authentication encoding follow the
public DSSE spec (``DSSEv1 <len> <type> <len> <payload>``). The
signature algorithm here is HMAC-SHA256 against key material from
``state/keys.InMemoryKeyStore`` — stdlib-only but real verification:
constant-time compare, per-signature key lookup, any-signature-passes
semantics, unknown key ids reported not crashed (verifier.go routes
per-signature errors the same way).
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json

import pyarrow as pa

from ray.data import Dataset

__all__ = ["pae", "sign_envelope", "DsseVerifier", "verify_envelopes"]


def pae(payload_type: str, payload: bytes) -> bytes:
    """DSSE Pre-Authentication Encoding (spec §Protocol)."""
    t = payload_type.encode("utf-8")
    return b"DSSEv1 %d %b %d %b" % (len(t), t, len(payload), payload)


def sign_envelope(
    payload_type: str, payload: bytes, key_id: str, material: bytes
) -> str:
    """Produce an envelope JSON string (the test/ingest-side helper)."""
    sig = hmac.new(material, pae(payload_type, payload), hashlib.sha256).digest()
    return json.dumps(
        {
            "payloadType": payload_type,
            "payload": base64.b64encode(payload).decode(),
            "signatures": [
                {"keyid": key_id, "sig": base64.b64encode(sig).decode()}
            ],
        },
        sort_keys=True,
    )


_OUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("key_id", pa.string()),
        ("verified", pa.bool_()),
        ("payload_digest", pa.string()),
        ("error", pa.string()),
    ]
)


class DsseVerifier:
    """Actor-pool batch UDF: (doc_id, envelope) rows → one row per
    signature with its verification verdict. Keys broadcast once via
    ``ray.put`` of the key-store dict."""

    def __init__(self, keys_ref):
        import ray

        keys = ray.get(keys_ref) if isinstance(keys_ref, ray.ObjectRef) else keys_ref
        self.keys: dict[str, bytes] = dict(keys)

    def _verify_one(self, doc_id: str, envelope: str) -> list[tuple]:
        try:
            env = json.loads(envelope)
            payload = base64.b64decode(env["payload"])
            ptype = env["payloadType"]
            sigs = env["signatures"]
            # the report-not-crash contract must hold for HOSTILE
            # containers too: signatures="abc" iterates into chars
            # (AttributeError at .get), 5 isn't iterable — both would
            # kill the whole batch task outside this guard
            if (not isinstance(sigs, list)
                    or any(not isinstance(s, dict) for s in sigs)):
                raise TypeError("signatures must be a list of objects")
            if not isinstance(ptype, str):
                raise TypeError("payloadType must be a string")
        except (json.JSONDecodeError, KeyError, TypeError, ValueError) as ex:
            return [(doc_id, "", False, "", f"bad envelope: {type(ex).__name__}")]
        digest = "sha256:" + hashlib.sha256(payload).hexdigest()
        msg = pae(ptype, payload)
        out = []
        for s in sigs:
            kid = str(s.get("keyid", ""))
            material = self.keys.get(kid)
            if material is None:
                out.append((doc_id, kid, False, digest, "unknown key id"))
                continue
            try:
                want = hmac.new(material, msg, hashlib.sha256).digest()
                got = base64.b64decode(s.get("sig", ""))
            except (TypeError, ValueError):
                out.append((doc_id, kid, False, digest, "malformed signature"))
                continue
            ok = hmac.compare_digest(want, got)
            out.append((doc_id, kid, ok, digest, "" if ok else "signature mismatch"))
        if not out:
            out.append((doc_id, "", False, digest, "no signatures"))
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        envs = batch["envelope"].to_pylist()
        rows: list[tuple] = []
        for i, e in zip(ids, envs):
            rows.extend(self._verify_one(str(i), e or ""))
        if not rows:
            return _OUT_SCHEMA.empty_table()
        cols = list(zip(*rows))
        return pa.Table.from_arrays(
            [pa.array(c, type=_OUT_SCHEMA.field(j).type) for j, c in enumerate(cols)],
            schema=_OUT_SCHEMA,
        )


def verify_envelopes(ds: Dataset, keystore, concurrency=(1, 2)) -> Dataset:
    """Verify every (doc_id, envelope) row against the key store."""
    import ray

    from guac_ray.state.keys import InMemoryKeyStore

    keys = keystore.as_dict() if isinstance(keystore, InMemoryKeyStore) else dict(keystore)
    kref = ray.put(keys)
    return ds.map_batches(
        DsseVerifier,
        fn_constructor_args=(kref,),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
