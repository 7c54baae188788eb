"""Random user-agent generation — reference parity for
lib/cloud-crawler/mozilla_agents.rb:33-54 (six templated Mozilla UA
generators, used when ``user_agent == "random"``, hook http.rb:104-107).

SEEDED: the reference draws from Ruby's global RNG, which would make crawl
results irreproducible; here every draw comes from a deterministic stream
keyed by (seed, request ordinal) so distributed fetches pick the same UA for
the same request regardless of scheduling.
"""

from __future__ import annotations

import random

_TEMPLATES = [
    "Mozilla/5.0 (Windows NT {win}.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/{chrome}.0.0.0 Safari/537.36",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_{mac}) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/{chrome}.0.0.0 Safari/537.36",
    "Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/{chrome}.0.0.0 Safari/537.36",
    "Mozilla/5.0 (Windows NT {win}.0; Win64; x64; rv:{ff}.0) Gecko/20100101 Firefox/{ff}.0",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10.{mac}; rv:{ff}.0) Gecko/20100101 Firefox/{ff}.0",
    "Mozilla/5.0 (X11; Linux x86_64; rv:{ff}.0) Gecko/20100101 Firefox/{ff}.0",
]


def random_agent(seed: int, ordinal: int) -> str:
    rng = random.Random((seed << 20) ^ ordinal)
    t = _TEMPLATES[rng.randrange(len(_TEMPLATES))]
    return t.format(
        win=rng.choice([10, 11]),
        mac=rng.randrange(12, 15),
        chrome=rng.randrange(110, 125),
        ff=rng.randrange(102, 125),
    )


def agent_for(spec_user_agent: str, seed: int, ordinal: int) -> str:
    """http.rb:104-107: literal UA unless the option is "random"."""
    if spec_user_agent == "random":
        return random_agent(seed, ordinal)
    return spec_user_agent
