"""Operator library: every transform is DataFrame -> DataFrame, declarative
(Catalyst-optimizable), and designed to hold at 100 TB / 1000 executors —
no driver-side collects, no row-at-a-time Python in hot paths."""
