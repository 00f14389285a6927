"""MySQL 8 partial JSON updates: path grammar, diff codec round-trip,
application semantics (JSON_SET/JSON_INSERT/JSON_REMOVE rules), and the
full PARTIAL_UPDATE_ROWS_EVENT (type 39) wire path."""

from __future__ import annotations

import json

import pytest

from ru_cdc_spark.sources.mysql_json_diff import (
    DIFF_INSERT,
    DIFF_REMOVE,
    DIFF_REPLACE,
    apply_json_diffs,
    decode_json_diffs,
    encode_json_diffs,
    parse_json_path,
)


class TestPathParsing:
    @pytest.mark.parametrize("path,legs", [
        ("$", []),
        ("$.a", [("member", "a")]),
        ("$.a.b", [("member", "a"), ("member", "b")]),
        ("$[3]", [("index", 3)]),
        ("$.a[0].b", [("member", "a"), ("index", 0), ("member", "b")]),
        ('$."x y"', [("member", "x y")]),
        ('$."quo\\"te"', [("member", 'quo"te')]),
    ])
    def test_grammar(self, path, legs):
        assert parse_json_path(path) == legs

    @pytest.mark.parametrize("bad", ["a.b", "$.", "$[x]", "$..a"])
    def test_rejects_malformed(self, bad):
        with pytest.raises(ValueError):
            parse_json_path(bad)


class TestDiffCodec:
    def test_roundtrip_all_ops(self):
        diffs = [
            (DIFF_REPLACE, "$.a", {"nested": [1, 2, True]}),
            (DIFF_INSERT, "$.b[2]", "text"),
            (DIFF_REMOVE, "$.c", None),
            (DIFF_REPLACE, "$[0]", None),
            (DIFF_INSERT, "$.big", 2**40),
        ]
        assert decode_json_diffs(encode_json_diffs(diffs)) == diffs

    def test_remove_two_tuple_accepted(self):
        b = encode_json_diffs([(DIFF_REMOVE, "$.x")])
        assert decode_json_diffs(b) == [(DIFF_REMOVE, "$.x", None)]

    def test_unknown_op_rejected(self):
        with pytest.raises(ValueError):
            decode_json_diffs(b"\x07\x02$.")


class TestApply:
    DOC = {"a": 1, "b": {"c": [10, 20]}, "d": "x"}

    def test_replace_member(self):
        out = apply_json_diffs(self.DOC, [(DIFF_REPLACE, "$.a", 99)])
        assert out["a"] == 99
        assert self.DOC["a"] == 1  # input untouched

    def test_replace_nested_index(self):
        out = apply_json_diffs(self.DOC, [(DIFF_REPLACE, "$.b.c[1]", 5)])
        assert out["b"]["c"] == [10, 5]

    def test_replace_missing_member_is_noop(self):
        out = apply_json_diffs(self.DOC, [(DIFF_REPLACE, "$.zz", 1)])
        assert "zz" not in out

    def test_insert_new_member(self):
        out = apply_json_diffs(self.DOC, [(DIFF_INSERT, "$.e", [1])])
        assert out["e"] == [1]

    def test_insert_existing_member_is_noop(self):
        out = apply_json_diffs(self.DOC, [(DIFF_INSERT, "$.a", 42)])
        assert out["a"] == 1  # JSON_INSERT does not overwrite

    def test_insert_array_append_and_middle(self):
        out = apply_json_diffs(self.DOC, [
            (DIFF_INSERT, "$.b.c[99]", 30),   # past end -> append
            (DIFF_INSERT, "$.b.c[0]", 5),     # insert at head
        ])
        assert out["b"]["c"] == [5, 10, 20, 30]

    def test_remove_member_and_index(self):
        out = apply_json_diffs(self.DOC, [
            (DIFF_REMOVE, "$.d", None),
            (DIFF_REMOVE, "$.b.c[0]", None),
        ])
        assert "d" not in out and out["b"]["c"] == [20]

    def test_whole_document_replace(self):
        out = apply_json_diffs(self.DOC, [(DIFF_REPLACE, "$", {"n": 1})])
        assert out == {"n": 1}

    def test_diffs_apply_in_order(self):
        out = apply_json_diffs({"v": [1]}, [
            (DIFF_INSERT, "$.v[99]", 2),
            (DIFF_REPLACE, "$.v[1]", 3),
        ])
        assert out["v"] == [1, 3]

    def test_unresolvable_intermediate_is_noop(self):
        out = apply_json_diffs(self.DOC, [(DIFF_REPLACE, "$.q.r", 1)])
        assert out == self.DOC


class TestPartialUpdateEvent:
    def test_wire_roundtrip_reconstructs_document(self):
        from ru_cdc_spark.sources.binlog_frames import (
            JSON_SPECS,
            _json_doc,
            _partial_json_diffs,
        )
        from ru_cdc_spark.sources.binlog_wire import (
            decode_frame,
            encode_partial_update_rows_event,
            encode_table_map,
        )

        for i in (0, 1, 3, 5, 15, 44):
            rows = [((i, _json_doc(i)), (i, True),
                     {1: _partial_json_diffs(i)})]
            frame = (encode_table_map(57, "testdb", "jp", JSON_SPECS)
                     + encode_partial_update_rows_event(57, JSON_SPECS,
                                                        rows))
            _s, _t, _e, out = decode_frame(frame)
            (before, after), = out
            doc = json.loads(after[1])
            assert doc["tag"] == f"u_{i % 50}"
            assert doc["rev"] == i % 9
            assert doc["vals"][0] == (i * 3) % 7
            assert ("ok" in doc["meta"]) == (i % 3 != 0)
            # before image untouched by the diff application
            assert json.loads(before[1])["tag"] == f"t_{i % 50}"

    def test_assembler_sees_partial_update_as_update(self):
        from ru_cdc_spark.sources import binlog_txn as bt
        from ru_cdc_spark.sources import binlog_wire as w
        from ru_cdc_spark.sources.binlog_frames import (
            JSON_SPECS,
            _json_doc,
        )
        from ru_cdc_spark.sources.mysql_json_diff import DIFF_REPLACE

        asm = bt.TxnAssembler()
        stream = (
            w.encode_gtid(bytes(16), 600, 0, 600)
            + w.encode_query("BEGIN", "testdb")
            + w.encode_table_map(57, "testdb", "jp", JSON_SPECS)
            + w.encode_partial_update_rows_event(
                57, JSON_SPECS,
                [((8, _json_doc(8)), (8, True),
                  {1: [(DIFF_REPLACE, "$.tag", "patched")]})]))
        # the txn fixture's schema has no JSON column, so feed can't emit
        # these rows through _rows (fixture-specific columns); assert the
        # event is recognized and buffered as an UPDATE image instead
        # (no XID appended — the txn stays open)
        asm.feed(stream)
        assert len(asm.images) == 1
        op, vals, _sql = asm.images[0]
        assert op == "UPDATE"
        assert json.loads(vals[1])["tag"] == "patched"
