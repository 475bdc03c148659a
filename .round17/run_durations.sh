#!/bin/bash
cd /root/repo
{ date; cat /proc/loadavg; } > .round17/pytest_durations_receipt.txt
python -m pytest tests/ -q --durations=120 > .round17/pytest_durations.txt 2>&1
echo "rc=$?" >> .round17/pytest_durations.txt
{ date; cat /proc/loadavg; } >> .round17/pytest_durations_receipt.txt
