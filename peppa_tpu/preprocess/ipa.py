"""ARPAbet -> IPA phoneme mapping for phoneme-distance analysis.

Capability parity: reference pig/ipa.py (arpa2ipa, used by the GRSA analysis
to compute phonemic edit distances between word tokens).  The table is the
standard 39-phoneme CMUdict ARPAbet set with IPA equivalents.
"""

from __future__ import annotations

import logging
from typing import Optional

ARPA_TO_IPA = {
    # vowels
    "AA": "ɑ", "AE": "æ", "AH": "ʌ", "AO": "ɔ", "AW": "aʊ", "AY": "aɪ",
    "EH": "ɛ", "ER": "ɝ", "EY": "eɪ", "IH": "ɪ", "IY": "i", "OW": "oʊ",
    "OY": "ɔɪ", "UH": "ʊ", "UW": "u",
    # consonants
    "B": "b", "CH": "tʃ", "D": "d", "DH": "ð", "F": "f", "G": "ɡ",
    "HH": "h", "JH": "dʒ", "K": "k", "L": "l", "M": "m", "N": "n",
    "NG": "ŋ", "P": "p", "R": "ɹ", "S": "s", "SH": "ʃ", "T": "t",
    "TH": "θ", "V": "v", "W": "w", "Y": "j", "Z": "z", "ZH": "ʒ",
}


def arpa2ipa(arpa: str, default: Optional[str] = None) -> Optional[str]:
    """Map one ARPAbet phoneme (stress digits stripped) to IPA.

    Parity: reference pig/ipa.py:53-58 — unknown phonemes log a warning and
    return `default`.
    """
    key = arpa.rstrip("012").upper()
    # gentle emits phones like 'ah_I' / 'k_B' (position-tagged); strip tags
    key = key.split("_")[0].upper()
    try:
        return ARPA_TO_IPA[key]
    except KeyError:
        logging.warning("Key not found: %s", arpa)
        return default


def phones_to_ipa(phones) -> str:
    """Join a gentle `phones` list (dicts with 'phone') into an IPA string."""
    out = []
    for p in phones:
        name = p["phone"] if isinstance(p, dict) else str(p)
        ipa = arpa2ipa(name, default="")
        if ipa:
            out.append(ipa)
    return "".join(out)
