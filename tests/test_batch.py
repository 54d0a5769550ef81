"""Batch global-label tests: kernel goldens from the reference spec
(FIXTURES.md T4, spec/top_secret/text_spec.rb:674-925) and the
distributed job vs the kernel implementation."""

import pytest

from top_secret_spark.kernel.batch import filter_all_local, global_mapping_from_mappings
from top_secret_spark.kernel.filters import RegexFilter, ScrubConfig

B1 = [
    "My email is ralph@example.com, and my credit card number is 4242424242424242",
    "I'll email ruby@example.com, and send her my new credit card number, which is 4141414141414141",
    "Please charge 4242424242424242 and email ruby@example.com and ralph@example.com",
    "This sentence contains no sensitive information",
]


def test_batch_b1_goldens():
    # text_spec.rb:679-722
    gmap, items = filter_all_local(B1)
    # the Ruby spec compares mapping hashes order-insensitively; the true
    # insertion order is CREDIT_CARD_1 first (msg0's own mapping is in
    # filter order: credit_card before email — text.rb:288-295)
    assert dict(gmap) == {
        "EMAIL_1": "ralph@example.com",
        "CREDIT_CARD_1": "4242424242424242",
        "EMAIL_2": "ruby@example.com",
        "CREDIT_CARD_2": "4141414141414141",
    }
    assert gmap[0] == ("CREDIT_CARD_1", "4242424242424242")
    assert items[0][0] == ("My email is [EMAIL_1], and my credit card number is "
                           "[CREDIT_CARD_1]")
    assert items[1][0] == ("I'll email [EMAIL_2], and send her my new credit card "
                           "number, which is [CREDIT_CARD_2]")
    assert items[2][0] == ("Please charge [CREDIT_CARD_1] and email [EMAIL_2] "
                           "and [EMAIL_1]")
    assert items[3][0] == B1[3]
    # per-item mappings (in GLOBAL-mapping order — Ruby Hash#slice keeps
    # receiver order, result.rb:58)
    assert dict(items[0][1]) == {"EMAIL_1": "ralph@example.com",
                                 "CREDIT_CARD_1": "4242424242424242"}
    assert dict(items[1][1]) == {"EMAIL_2": "ruby@example.com",
                                 "CREDIT_CARD_2": "4141414141414141"}
    assert dict(items[2][1]) == {"EMAIL_1": "ralph@example.com",
                                 "CREDIT_CARD_1": "4242424242424242",
                                 "EMAIL_2": "ruby@example.com"}
    assert items[2][1][0] == ("CREDIT_CARD_1", "4242424242424242")
    assert items[3][1] == []


def test_batch_b2_no_refilter_across_messages():
    # text_spec.rb:768-790
    msgs = ["Email user@example.com in Boston, MA.",
            "Contact admin@example.com in Boston."]
    ents = [[{"text": "Boston", "tag": "LOCATION", "score": 0.5},
             {"text": "MA", "tag": "LOCATION", "score": 0.5}],
            [{"text": "Boston", "tag": "LOCATION", "score": 0.5}]]
    gmap, items = filter_all_local(msgs, ents)
    assert items[0][0] == "Email [EMAIL_1] in [LOCATION_1], [LOCATION_2]."
    assert items[1][0] == "Contact [EMAIL_2] in [LOCATION_1]."


def test_batch_b3_custom_filter_numbering():
    # text_spec.rb:798-819 — custom email regex, numbering by first appearance
    custom_email = RegexFilter("EMAIL_ADDRESS", r"\w+\[at\]\w+\.\w+")
    cfg = ScrubConfig(overrides={"email_filter": custom_email})
    msgs = ["Contact ralph[at]example.com about card 4141414141414141",
            "Contact ruby[at]example.com about card 4242424242424242"]
    gmap, items = filter_all_local(msgs, config=cfg)
    gdict = dict(gmap)
    assert gdict["EMAIL_ADDRESS_1"] == "ralph[at]example.com"
    assert gdict["EMAIL_ADDRESS_2"] == "ruby[at]example.com"
    assert gdict["CREDIT_CARD_1"] == "4141414141414141"
    assert gdict["CREDIT_CARD_2"] == "4242424242424242"
    assert items[0][0] == "Contact [EMAIL_ADDRESS_1] about card [CREDIT_CARD_1]"
    assert items[1][0] == "Contact [EMAIL_ADDRESS_2] about card [CREDIT_CARD_2]"


def test_global_numbering_first_seen_type_wins():
    # a value first seen under EMAIL keeps type EMAIL even if later seen
    # under another key type (global_mapping.rb:42 first-seen wins)
    mappings = [[("EMAIL_1", "x@y.com")], [("CUSTOM_1", "x@y.com")]]
    gmap = global_mapping_from_mappings(mappings)
    assert gmap == [("EMAIL_1", "x@y.com")]


def test_nonsensitive_results_skipped():
    mappings = [[], [("EMAIL_1", "a@b.com")], []]
    gmap = global_mapping_from_mappings(mappings)
    assert gmap == [("EMAIL_1", "a@b.com")]


# --- distributed job vs kernel ------------------------------------------------


@pytest.fixture(scope="module")
def batch_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(B1)], ["msg_idx", "input"]
    )


def test_distributed_batch_matches_kernel(spark, batch_df):
    from top_secret_spark.operators.batch import batch_scrub

    items_df, gmap = batch_scrub(batch_df)
    exp_gmap, exp_items = filter_all_local(B1)
    assert gmap == exp_gmap
    rows = items_df.orderBy("msg_idx").collect()
    for row, (exp_out, exp_map) in zip(rows, exp_items):
        assert row["output"] == exp_out
        assert [(e["key"], e["value"]) for e in row["mapping"]] == exp_map


def test_distributed_batch_larger_scale(spark):
    """200 messages with overlapping values across messages — global
    numbering must match the kernel exactly."""
    from top_secret_spark.operators.batch import batch_scrub

    msgs = []
    for i in range(200):
        msgs.append(
            f"msg {i}: contact user{i % 17}@example.com or "
            f"call {200 + i % 5}00-555-{1000 + i % 13:04d}"
        )
    df = spark.createDataFrame(list(enumerate(msgs)), ["msg_idx", "input"])
    items_df, gmap = batch_scrub(df)
    exp_gmap, exp_items = filter_all_local(msgs)
    assert gmap == exp_gmap
    rows = items_df.orderBy("msg_idx").collect()
    for row, (exp_out, exp_map) in zip(rows, exp_items):
        assert row["output"] == exp_out
        assert [(e["key"], e["value"]) for e in row["mapping"]] == exp_map


def test_batch_scrub_enforces_max_global_values(spark):
    """batch_scrub is a bounded-batch API: exceeding max_global_values
    must raise with guidance (pointing at per-clip numbering), never
    attempt an unbounded driver collect."""
    from top_secret_spark.operators.batch import batch_scrub

    msgs = [(i, f"mail user{i}@example.com") for i in range(40)]
    df = spark.createDataFrame(msgs, ["msg_idx", "input"])
    with pytest.raises(ValueError, match="max_global_values"):
        batch_scrub(df, max_global_values=10)
    # at the bound is fine
    items, gmap = batch_scrub(df, max_global_values=40)
    assert len(gmap) == 40 and items.count() == 40
