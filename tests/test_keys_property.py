"""Property-based tests (hypothesis) for the key-encoding trick.

The whole range-query design rests on one invariant the reference
engineers by hand (/root/reference/ipset/ipset.go:23-53): lexicographic
order over encoded keys == numeric order over addresses, and CIDR
containment == between(lo, hi) on keys. Verify it exhaustively-ish.
No Spark needed — these are the driver-side helpers.
"""

from __future__ import annotations

import ipaddress

from hypothesis import given, settings, strategies as st

from flow_indexer_spark.functions.keys import (
    cidr_to_key_range,
    ip_to_key,
    key_to_ip,
)

ipv4s = st.integers(min_value=0, max_value=2**32 - 1).map(
    lambda n: str(ipaddress.IPv4Address(n))
)
ipv6s = st.integers(min_value=0, max_value=2**128 - 1).map(
    lambda n: str(ipaddress.IPv6Address(n))
)


@given(st.one_of(ipv4s, ipv6s))
def test_roundtrip(ip):
    key = ip_to_key(ip)
    assert key is not None
    assert key_to_ip(key) == str(ipaddress.ip_address(ip))


@given(ipv4s, ipv4s)
def test_key_order_matches_numeric_order_v4(a, b):
    ka, kb = ip_to_key(a), ip_to_key(b)
    assert (ka < kb) == (int(ipaddress.ip_address(a)) < int(ipaddress.ip_address(b)))


@given(ipv6s, ipv6s)
def test_key_order_matches_numeric_order_v6(a, b):
    ka, kb = ip_to_key(a), ip_to_key(b)
    assert (ka < kb) == (int(ipaddress.ip_address(a)) < int(ipaddress.ip_address(b)))


@settings(max_examples=200)
@given(ipv4s, st.integers(min_value=0, max_value=32), ipv4s)
def test_cidr_containment_equals_key_between_v4(net_ip, prefix, probe):
    net = ipaddress.ip_network(f"{net_ip}/{prefix}", strict=False)
    lo, hi = cidr_to_key_range(str(net))
    pk = ip_to_key(probe)
    assert (lo <= pk <= hi) == (ipaddress.ip_address(probe) in net)


@settings(max_examples=100)
@given(ipv6s, st.integers(min_value=0, max_value=128), ipv6s)
def test_cidr_containment_equals_key_between_v6(net_ip, prefix, probe):
    net = ipaddress.ip_network(f"{net_ip}/{prefix}", strict=False)
    lo, hi = cidr_to_key_range(str(net))
    pk = ip_to_key(probe)
    assert (lo <= pk <= hi) == (ipaddress.ip_address(probe) in net)


@given(st.text(max_size=20))
def test_invalid_strings_are_rejected_not_crashed(s):
    # the loose extraction regex feeds arbitrary-ish tokens here
    key = ip_to_key(s)
    if key is not None:
        assert key_to_ip(key) == str(ipaddress.ip_address(s))


def test_family_separation():
    # v4 and v6 keys can never collide or interleave families by accident:
    # lengths differ (8 vs 32) and the between-scan adds a length guard
    assert len(ip_to_key("255.255.255.255")) == 8
    assert len(ip_to_key("::")) == 32
