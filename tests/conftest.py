import json
import os

import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="session")
def golden_units():
    with open(os.path.join(GOLDEN_DIR, "units.json")) as f:
        return json.load(f)


@pytest.fixture(scope="session")
def golden_flight_liquid():
    with open(os.path.join(GOLDEN_DIR, "flight_liquid_nowind.json")) as f:
        return json.load(f)


@pytest.fixture(scope="session")
def golden_flight_solid():
    with open(os.path.join(GOLDEN_DIR, "flight_solid_nowind.json")) as f:
        return json.load(f)


@pytest.fixture(scope="session")
def golden_flight_csvwind():
    with open(os.path.join(GOLDEN_DIR, "flight_liquid_csvwind.json")) as f:
        return json.load(f)
