"""Format-layer coverage: CycloneDX XML (parser_cyclonedx.go:219-230
FormatXML branch), JSON Lines unpack (processor/jsonlines), and
compressed document transparency in the shared reader (process.go
Encoding dispatch). Verified once against the reference's own XML
fixtures: laravel-cyclonedx.xml parses (1 has_sbom / 114 has_metadata /
174 depends_on), cyclonedx-vex.xml rejects on the version-less
affects ref exactly like the Go parser, invalid-cyclonedx.xml rejects
at the XML layer; busybox-cyclonedx.json.bz2 decodes transparently."""

from __future__ import annotations

import bz2
import gzip
import json

import pytest

from guac_ray.sources.cyclonedx import (CdxError, cyclonedx_xml_to_dict,
                                        parse_cyclonedx_document)
from guac_ray.sources.spdx import (guess_document_type,
                                   parse_jsonlines_document)

_NS = "http://cyclonedx.org/schema/bom/1.4"

_XML_BOM = f"""<?xml version="1.0" encoding="UTF-8"?>
<bom xmlns="{_NS}" version="1" serialNumber="urn:uuid:x1">
  <metadata>
    <timestamp>2024-07-07T00:00:00Z</timestamp>
    <component type="application" bom-ref="root">
      <name>rootapp</name>
      <version>2.0</version>
      <purl>pkg:composer/acme/rootapp@2.0</purl>
    </component>
  </metadata>
  <components>
    <component type="library" bom-ref="pkg:composer/acme/liba@1.0">
      <name>liba</name>
      <version>1.0</version>
      <purl>pkg:composer/acme/liba@1.0</purl>
      <hashes><hash alg="SHA-256">{"ab" * 16}</hash></hashes>
    </component>
    <component type="library" bom-ref="pkg:composer/acme/libb@1.1">
      <name>libb</name>
      <version>1.1</version>
      <purl>pkg:composer/acme/libb@1.1</purl>
    </component>
  </components>
  <dependencies>
    <dependency ref="pkg:composer/acme/liba@1.0">
      <dependency ref="pkg:composer/acme/libb@1.1"/>
    </dependency>
  </dependencies>
</bom>
"""

_XML_VEX = f"""<bom xmlns="{_NS}" version="1">
  <vulnerabilities>
    <vulnerability>
      <id>CVE-2024-9999</id>
      <published>2024-01-01T00:00:00Z</published>
      <ratings>
        <rating><score>9.8</score><method>CVSSv3</method></rating>
      </ratings>
      <analysis>
        <state>not_affected</state>
        <justification>code_not_reachable</justification>
        <responses><response>will_not_fix</response></responses>
      </analysis>
      <affects>
        <target>
          <ref>urn:cdx:z/1#widget</ref>
          <versions><version><version>1.2.3</version></version></versions>
        </target>
      </affects>
    </vulnerability>
  </vulnerabilities>
</bom>
"""


class TestCdxXml:
    def test_guesser_routes_xml(self):
        assert guess_document_type(_XML_BOM.encode()) == "cyclonedx-json"
        assert guess_document_type(b"<notbom/>") is None
        assert guess_document_type(b"<bom unclosed") is None

    def test_sbom_graph(self):
        edges = parse_cyclonedx_document(_XML_BOM.encode(), source="x")
        by = {}
        for e in edges:
            by.setdefault(e[2], []).append(e)
        # top fan-out to both libs + the explicit liba→libb edge
        assert len(by["depends_on"]) == 3
        assert ("pkg:composer/acme/liba@1.0",
                "pkg:composer/acme/libb@1.1") in {
            (e[1], e[4]) for e in by["depends_on"]}
        assert by["is_occurrence"][0][4] == "sha-256:" + "ab" * 16
        assert by["has_sbom"][0][1] == "pkg:composer/acme/rootapp@2.0"

    def test_vex_xml(self):
        edges = parse_cyclonedx_document(_XML_VEX.encode())
        aff = [e for e in edges if e[2] == "affected_by"]
        assert len(aff) == 1
        # name#version ref without purl synthesizes the guac pkg purl
        assert aff[0][1] == "pkg:guac/pkg/widget@1.2.3"
        p = json.loads(aff[0][5])
        assert p["status"] == "NOT_AFFECTED"
        assert p["vex_justification"] == "VULNERABLE_CODE_NOT_IN_EXECUTE_PATH"
        vm = [e for e in edges if e[2] == "vuln_metadata"]
        assert json.loads(vm[0][5])["score_value"] == 9.8

    def test_xml_dict_shape(self):
        d = cyclonedx_xml_to_dict(_XML_BOM.encode())
        assert d["serialNumber"] == "urn:uuid:x1"
        assert d["metadata"]["component"]["name"] == "rootapp"
        assert d["dependencies"] == [{"ref": "pkg:composer/acme/liba@1.0",
                                      "dependsOn":
                                          ["pkg:composer/acme/libb@1.1"]}]

    def test_invalid_xml_rejects(self):
        with pytest.raises(CdxError, match="XML"):
            parse_cyclonedx_document(b"<bom unclosed")
        with pytest.raises(CdxError, match="BOM element"):
            parse_cyclonedx_document(b"<other/>")


def _vuln_line(purl: str) -> str:
    return json.dumps({
        "_type": "https://in-toto.io/Statement/v0.1",
        "predicateType": "https://in-toto.io/attestation/vuln/v0.1",
        "subject": [{"name": purl}],
        "predicate": {"scanner": {"result":
                                  [{"vulnerability_id": "CVE-2024-5"}]},
                      "metadata": {"scannedOn": "2024-01-01T00:00:00Z"}}})


class TestJsonLines:
    def test_guess_and_parse(self):
        blob = (_vuln_line("pkg:npm/a@1") + "\n"
                + _vuln_line("pkg:npm/b@2")).encode()
        assert guess_document_type(blob) == "json-lines"
        edges = parse_jsonlines_document(blob)
        assert len(edges) == 4  # vuln_equal + certify_vuln per line
        assert {e[1] for e in edges if e[2] == "certify_vuln"} == {
            "pkg:npm/a@1", "pkg:npm/b@2"}

    def test_single_line_is_plain_json(self):
        assert guess_document_type(_vuln_line("pkg:npm/a@1").encode()) \
            == "ite6"

    def test_unroutable_line_rejects(self):
        blob = (_vuln_line("pkg:npm/a@1") + '\n{"mystery": 1}').encode()
        with pytest.raises(Exception, match="unroutable line 1"):
            parse_jsonlines_document(blob)

    def test_pretty_json_not_jsonlines(self):
        pretty = json.dumps(json.loads(_vuln_line("pkg:npm/a@1")),
                            indent=2).encode()
        assert guess_document_type(pretty) == "ite6"


class TestCompressedDocs:
    def test_bz2_and_gz_and_jsonl_through_reader(self, ray_session,
                                                 tmp_path):
        from guac_ray.sources.spdx import read_documents_any
        (tmp_path / "a.json.bz2").write_bytes(
            bz2.compress(_vuln_line("pkg:npm/a@1").encode()))
        (tmp_path / "b.json.gz").write_bytes(
            gzip.compress(_vuln_line("pkg:npm/b@2").encode()))
        (tmp_path / "c.xml").write_text(_XML_BOM)
        (tmp_path / "d.jsonl").write_text(
            _vuln_line("pkg:npm/c@3") + "\n" + _vuln_line("pkg:npm/d@4"))
        (tmp_path / "skip.txt").write_text("not a doc")
        df = read_documents_any(str(tmp_path)).to_pandas()
        cv = df[df["pred"] == "certify_vuln"]
        assert set(cv["subj_key"]) == {"pkg:npm/a@1", "pkg:npm/b@2",
                                       "pkg:npm/c@3", "pkg:npm/d@4"}
        assert (df["pred"] == "has_sbom").sum() == 1  # the XML BOM


class TestWave6Hardening:
    """Round-5 session-11 review wave over the sources family."""

    def test_coerce_schema_salvages_per_row(self, ray_session, tmp_path):
        """One bad value must null ONE row, not reject-route the whole
        batch (the documented per-row contract)."""
        import json

        import ray.data as rd

        from guac_ray.sources.readers import read_transcripts_any

        p = tmp_path / "t.jsonl"
        rows = [
            {"conv_id": "c1", "turn_idx": "0", "role": "user",
             "text": "hello", "tool": "", "ts": "2024-01-01T00:00:00"},
            {"conv_id": "c1", "turn_idx": "oops", "role": "user",
             "text": "still valid text", "tool": "",
             "ts": "2024-01-01T00:00:01"},
            {"conv_id": "c1", "turn_idx": "2", "role": "user",
             "text": "also fine", "tool": "",
             "ts": "2024-01-01T00:00:02"},
        ]
        p.write_text("\n".join(json.dumps(r) for r in rows))
        df = read_transcripts_any(str(p)).to_pandas()
        assert len(df) == 3
        ok = df[df.turn_idx.notna()]
        assert sorted(ok["turn_idx"].astype(int).tolist()) == [0, 2]
        bad = df[df.turn_idx.isna()]
        assert bad["text"].tolist() == ["still valid text"]

    def test_read_transcripts_empty_dir(self, ray_session, tmp_path):
        from guac_ray.sources.readers import read_transcripts_any

        d = tmp_path / "empty"
        d.mkdir()
        (d / "nested").mkdir()     # subdirectory must not crash sniff
        ds = read_transcripts_any(str(d))
        assert ds.count() == 0
        assert "conv_id" in ds.schema().names

    def test_dsse_wrapped_cyclonedx_parses(self, ray_session):
        """A DSSE envelope wrapping a CycloneDX BOM must parse (or
        reject) — not KeyError past the reject route in a fresh-worker
        registry state."""
        import base64
        import importlib
        import json
        import subprocess
        import sys

        code = """
import base64, json
from guac_ray.sources.ite6 import parse_dsse_document
bom = {"bomFormat": "CycloneDX", "specVersion": "1.5",
       "metadata": {"component": {"type": "library", "name": "x",
                                   "purl": "pkg:npm/x@1.0.0"}}}
env = {"payload": base64.b64encode(
           json.dumps(bom).encode()).decode(),
       "payloadType": "application/vnd.cyclonedx+json",
       "signatures": [{"keyid": "k1", "sig": "Zm9v"}]}
edges = parse_dsse_document(json.dumps(env).encode())
assert isinstance(edges, list) and edges, edges
print("OK", len(edges))
"""
        # fresh process = fresh registry (only ite6→spdx imported)
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True, cwd="/root/repo")
        assert r.returncode == 0, r.stderr
        assert r.stdout.startswith("OK")

    def test_hostile_document_shapes_reject_not_crash(self, ray_session):
        import pytest

        from guac_ray.sources.cyclonedx import CdxError, parse_cyclonedx_document
        from guac_ray.sources.spdx import SpdxError, parse_spdx_document

        with pytest.raises(SpdxError):
            parse_spdx_document(b"[1,2]")
        with pytest.raises(CdxError):
            parse_cyclonedx_document(b"[1,2,3]")
        with pytest.raises(CdxError):
            parse_cyclonedx_document(
                b'{"bomFormat":"CycloneDX","metadata":[]}')
        xml = (b'<?xml version="1.0"?><bom xmlns="http://cyclonedx.org/'
               b'schema/bom/1.5"><vulnerabilities><vulnerability>'
               b'<ratings><rating><score>N/A</score></rating></ratings>'
               b'</vulnerability></vulnerabilities></bom>')
        with pytest.raises(CdxError):
            parse_cyclonedx_document(xml)

    def test_y4m_garbled_header_stubs(self):
        from guac_ray.functions.multimodal import decode_y4m

        assert decode_y4m(b"YUV4MPEG2 W2 H2 F25 C420\nFRAME\nxxxx") is None
        assert decode_y4m(b"YUV4MPEG2 W1x H2 F25:1 C420\n") is None

    def test_write_clustered_rerun_no_duplicates(self, ray_session,
                                                 tmp_path):
        import pandas as pd
        import ray.data as rd

        from guac_ray.sources.layout import read_pruned, write_clustered

        df = pd.DataFrame({"k": range(100),
                           "v": [i * 7 % 100 for i in range(100)]})
        out = str(tmp_path / "clustered")
        write_clustered(rd.from_pandas(df), out, "v", num_ranges=4)
        # rerun into the SAME dir (the re-runnability contract): rows
        # must not double
        m2 = write_clustered(rd.from_pandas(df), out, "v", num_ranges=4)
        assert sum(r["rows"] for r in m2["ranges"]) == 100
