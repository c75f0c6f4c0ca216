"""Reference configuration data for pipeline parity.

These literals are the reference's embedded lookup/filter data, kept
byte-for-byte so golden outputs match (SURVEY §2.12 #5/#6: duplicated
entries and trailing/odd characters in the lists are significant and
deliberately preserved).
"""

from __future__ import annotations

# process_open_data.py:102-125 — postal code -> arrondissement label.
ARRONDISSEMENTS: dict[int, str] = {75000 + i: f"Paris {i:02d}" for i in range(1, 21)}

# process_open_data.py:130-186 — categories imported into WordPress.
# Contains duplicated entries exactly as in the reference (quirk §2.12 #6 —
# harmless for isin, preserved for parity).
EVENT_CATEGORIES: list[str] = [
    "Concerts -> Hip-Hop",
    "Concerts -> Rock",
    "Spectacles -> Théâtre",
    "Animations -> Stage",
    "Concerts -> Musiques du Monde",
    "Événements -> Événement sportif",
    "Spectacles -> Théâtre",
    "Animations -> Stage",
    "Concerts -> Musiques du Monde",
    "Événements -> Événement sportif",
    "Concerts -> Chanson française",
    "Spectacles -> Jeune public",
    "Concerts -> Autre concert",
    "Expositions -> Autre expo",
    "Concerts -> Électronique",
    "Expositions -> Art Contemporain",
    "Spectacles -> Autre spectacle",
    "Concerts -> Classique",
    "Concerts -> Jazz",
    "Expositions -> Illustration / BD",
    "Spectacles -> Danse",
    "Expositions -> Beaux-Arts",
    "Concerts -> Soul / Funk",
    "Spectacles -> Opéra / Musical",
    "Concerts -> Pop / Variété",
    "Concerts -> Reggae",
    "Expositions -> Street-art",
    "Concerts -> Folk",
]

# process_open_data.py:189-237 — category -> main category.
MAIN_CATEGORY: dict[str, str] = {
    "Concerts -> Hip-Hop": "Musique",
    "Concerts -> Rock": "Musique",
    "Spectacles -> Théâtre": "Arts et Loisirs",
    "Animations -> Stage": "Sport, Arts et Loisirs",
    "Concerts -> Musiques du Monde": "Musique",
    "Événements -> Événement sportif": "Sport",
    "Concerts -> Chanson française": "Musique",
    "Spectacles -> Jeune public": "Eveil Enfant",
    "Concerts -> Autre concert": "Musique",
    "Concerts -> Électronique": "Musique",
    "Expositions -> Art Contemporain": "Arts et Loisirs",
    "Concerts -> Classique": "Musique",
    "Concerts -> Jazz": "Musique",
    "Expositions -> Illustration / BD": "Arts et Loisirs",
    "Expositions -> Photographie": "Arts et Loisirs",
    "Spectacles -> Danse": "Sport",
    "Expositions -> Beaux-Arts": "Arts et Loisirs",
    "Concerts -> Soul / Funk": "Musique",
    "Spectacles -> Opéra / Musical": "Musique",
    "Concerts -> Pop / Variété": "Musique",
    "Concerts -> Reggae": "Musique",
    "Expositions -> Street-art": "Arts et Loisirs",
    "Concerts -> Folk": "Musique",
}

# process_open_data.py:240-245 — price type mapping (unmatched -> null).
PRICE_TYPE: dict[str, str] = {"payant": "Payant", "gratuit": "Libre"}


def reference_sanitize(name: str, dashes: bool = False) -> str:
    """The reference's exact column-name cleanup chain
    (process_open_data.py:39-43; wp_export_data.py:52-65 adds ``-``).
    Case-preserving, unlike the engine-level ``sanitize_column_name``.
    """
    out = (
        name.replace("é", "e")
        .replace(" ", "_")
        .replace("è", "e")
        .replace("à", "a")
        .replace("'", "_")
    )
    if dashes:
        out = out.replace("-", "_")
    return out
