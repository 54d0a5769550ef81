"""Category-projection tests (reference: spec/top_secret/category_spec.rb,
spec/top_secret/result_spec.rb:42-158)."""

from top_secret_spark.kernel.categories import (
    categories,
    category_values,
    filter_mapping,
    has_category,
    pluralize,
    sensitive,
    type_from_key,
)

MAPPING = [
    ("EMAIL_1", "ralph@example.com"),
    ("EMAIL_2", "ruby@example.com"),
    ("CREDIT_CARD_1", "4242424242424242"),
    ("EMAIL_ADDRESS_1", "user[at]example.com"),
]


def test_type_from_key():
    # category.rb:39-41 — strip the final _N only
    assert type_from_key("EMAIL_1") == "EMAIL"
    assert type_from_key("CREDIT_CARD_2") == "CREDIT_CARD"
    assert type_from_key("EMAIL_ADDRESS_10") == "EMAIL_ADDRESS"


def test_exact_type_no_prefix_conflation():
    # result_spec.rb:103-125 — EMAIL_ADDRESS_1 never leaks into "email"
    assert category_values(MAPPING, "email") == [
        "ralph@example.com", "ruby@example.com"]
    assert category_values(MAPPING, "email_address") == ["user[at]example.com"]


def test_filter_mapping_and_predicates():
    assert filter_mapping(MAPPING, "credit_card") == [
        ("CREDIT_CARD_1", "4242424242424242")]
    assert has_category(MAPPING, "email")
    assert not has_category(MAPPING, "ssn")
    assert sensitive(MAPPING) and not sensitive([])


def test_categories_listing():
    # mapping.rb:62-66 — only types with >= 1 match
    cats = categories(MAPPING, ["CREDIT_CARD", "EMAIL", "PHONE_NUMBER",
                                "SSN", "PERSON", "LOCATION"])
    assert set(cats) == {"email", "credit_card", "email_address"}


def test_pluralize_label_vocabulary():
    # category.rb:57-59 (ActiveSupport#pluralize) — the labels we meet
    assert pluralize("email") == "emails"
    assert pluralize("person") == "people"
    assert pluralize("credit_card") == "credit_cards"
    assert pluralize("ip_address") == "ip_addresses"
    assert pluralize("ssn") == "ssns"
    assert pluralize("location") == "locations"
    assert pluralize("category") == "categories"
