#!/bin/sh
# Serialize TPU client processes against the single axon chip claim.
#
# Two concurrent clients serialize inside the tunnel anyway, and a client
# killed mid-compile wedges the claim for ~5-10 minutes for EVERYONE
# (docs/tpu_rdoq_issue.md "the tunnel chip claim serializes and wedges").
# Every TPU entry point should therefore run as
#   tools/with_tpu_lock.sh python <script> ...
# so at most one client exists at a time; waiters block (default up to 2 h,
# override with TPU_LOCK_WAIT seconds) instead of piling onto the claim.
exec flock -w "${TPU_LOCK_WAIT:-7200}" /tmp/coolchic_tpu.lock "$@"
