"""Public ISO 3166 name tables (pycountry replacement — that library
is not available in this environment, and the ETL only needs the
English short names the OSM wiki uses).

- ``COUNTRY_ALPHA2``: ISO 3166-1 English short name -> alpha-2 code.
- ``SUBDIVISIONS``: (alpha2, subdivision display name) -> ISO 3166-2
  code, covering every subdivision family present in the reference
  dataset (US states + DC, Canadian provinces/territories, Australian
  states/territories, plus the Belgian/Micronesian/Dutch-Caribbean/
  British and Bahamian entries the wiki names).

Reference parity: the reference resolves names with pycountry plus
manual overrides (parser/parsers/parse_utils.py:149-191); the
override set lives in ``wiki_etl.NAME_OVERRIDES``.
"""

from __future__ import annotations

COUNTRY_ALPHA2: dict[str, str] = {
    "Afghanistan": "AF", "Albania": "AL", "Algeria": "DZ",
    "American Samoa": "AS", "Andorra": "AD", "Angola": "AO",
    "Anguilla": "AI", "Antigua and Barbuda": "AG", "Argentina": "AR",
    "Armenia": "AM", "Aruba": "AW", "Australia": "AU", "Austria": "AT",
    "Azerbaijan": "AZ", "Bahamas": "BS", "Bahrain": "BH",
    "Bangladesh": "BD", "Barbados": "BB", "Belarus": "BY",
    "Belgium": "BE", "Belize": "BZ", "Benin": "BJ", "Bermuda": "BM",
    "Bhutan": "BT", "Bolivia": "BO", "Bosnia and Herzegovina": "BA",
    "Botswana": "BW", "Brazil": "BR",
    "British Indian Ocean Territory": "IO",
    "British Virgin Islands": "VG", "Brunei Darussalam": "BN",
    "Bulgaria": "BG", "Burkina Faso": "BF", "Burundi": "BI",
    "Cabo Verde": "CV", "Cape Verde": "CV", "Cambodia": "KH",
    "Cameroon": "CM", "Canada": "CA", "Cayman Islands": "KY",
    "Central African Republic": "CF", "Chad": "TD", "Chile": "CL",
    "China": "CN", "Christmas Island": "CX",
    "Cocos (Keeling) Islands": "CC", "Colombia": "CO", "Comoros": "KM",
    "Congo": "CG", "Cook Islands": "CK", "Costa Rica": "CR",
    "Croatia": "HR", "Cuba": "CU", "Curacao": "CW", "Curaçao": "CW",
    "Cyprus": "CY", "Czechia": "CZ", "Czech Republic": "CZ",
    "Denmark": "DK", "Djibouti": "DJ", "Dominica": "DM",
    "Dominican Republic": "DO", "Ecuador": "EC", "Egypt": "EG",
    "El Salvador": "SV", "Equatorial Guinea": "GQ", "Eritrea": "ER",
    "Estonia": "EE", "Eswatini": "SZ", "Ethiopia": "ET",
    "Falkland Islands": "FK", "Faroe Islands": "FO", "Fiji": "FJ",
    "Finland": "FI", "France": "FR", "French Guiana": "GF",
    "French Polynesia": "PF", "Gabon": "GA", "Gambia": "GM",
    "Georgia": "GE", "Germany": "DE", "Ghana": "GH", "Gibraltar": "GI",
    "Greece": "GR", "Greenland": "GL", "Grenada": "GD",
    "Guadeloupe": "GP", "Guam": "GU", "Guatemala": "GT",
    "Guernsey": "GG", "Guinea": "GN", "Guinea-Bissau": "GW",
    "Guyana": "GY", "Haiti": "HT", "Honduras": "HN", "Hong Kong": "HK",
    "Hungary": "HU", "Iceland": "IS", "India": "IN", "Indonesia": "ID",
    "Iran": "IR", "Iraq": "IQ", "Ireland": "IE", "Isle of Man": "IM",
    "Israel": "IL", "Italy": "IT", "Ivory Coast": "CI",
    "Côte d'Ivoire": "CI", "Jamaica": "JM", "Japan": "JP",
    "Jersey": "JE", "Jordan": "JO", "Kazakhstan": "KZ", "Kenya": "KE",
    "Kiribati": "KI", "Kuwait": "KW", "Kyrgyzstan": "KG", "Laos": "LA",
    "Latvia": "LV", "Lebanon": "LB", "Lesotho": "LS", "Liberia": "LR",
    "Libya": "LY", "Liechtenstein": "LI", "Lithuania": "LT",
    "Luxembourg": "LU", "Macau": "MO", "Madagascar": "MG",
    "Malawi": "MW", "Malaysia": "MY", "Maldives": "MV", "Mali": "ML",
    "Malta": "MT", "Marshall Islands": "MH", "Martinique": "MQ",
    "Mauritania": "MR", "Mauritius": "MU", "Mayotte": "YT",
    "Mexico": "MX", "Moldova": "MD", "Monaco": "MC", "Mongolia": "MN",
    "Montenegro": "ME", "Montserrat": "MS", "Morocco": "MA",
    "Mozambique": "MZ", "Myanmar": "MM", "Namibia": "NA", "Nauru": "NR",
    "Nepal": "NP", "Netherlands": "NL", "New Caledonia": "NC",
    "New Zealand": "NZ", "Nicaragua": "NI", "Niger": "NE",
    "Nigeria": "NG", "Niue": "NU", "Norfolk Island": "NF",
    "North Korea": "KP", "North Macedonia": "MK",
    "Northern Mariana Islands": "MP", "Norway": "NO", "Oman": "OM",
    "Pakistan": "PK", "Palau": "PW", "Panama": "PA",
    "Papua New Guinea": "PG", "Paraguay": "PY", "Peru": "PE",
    "Philippines": "PH", "Poland": "PL", "Portugal": "PT",
    "Puerto Rico": "PR", "Qatar": "QA", "Romania": "RO",
    "Russian Federation": "RU", "Rwanda": "RW", "Réunion": "RE",
    "Reunion": "RE", "Saint Barthélemy": "BL", "Saint Helena": "SH",
    "Saint Kitts and Nevis": "KN", "Saint Lucia": "LC",
    "Saint Martin": "MF", "Saint Pierre and Miquelon": "PM",
    "Saint Vincent and the Grenadines": "VC", "Samoa": "WS",
    "San Marino": "SM", "Sao Tome and Principe": "ST",
    "Saudi Arabia": "SA", "Senegal": "SN", "Serbia": "RS",
    "Seychelles": "SC", "Sierra Leone": "SL", "Singapore": "SG",
    "Sint Maarten": "SX", "Slovakia": "SK", "Slovenia": "SI",
    "Solomon Islands": "SB", "Somalia": "SO", "South Africa": "ZA",
    "South Korea": "KR", "South Sudan": "SS", "Spain": "ES",
    "Sri Lanka": "LK", "Sudan": "SD", "Suriname": "SR", "Sweden": "SE",
    "Switzerland": "CH", "Syria": "SY", "Taiwan": "TW",
    "Tajikistan": "TJ", "Tanzania": "TZ", "Thailand": "TH",
    "Timor-Leste": "TL", "East Timor": "TL", "Togo": "TG",
    "Tokelau": "TK", "Tonga": "TO", "Trinidad and Tobago": "TT",
    "Tunisia": "TN", "Turkmenistan": "TM",
    "Turks and Caicos Islands": "TC", "Tuvalu": "TV", "Uganda": "UG",
    "Ukraine": "UA", "United Arab Emirates": "AE",
    "United Kingdom": "GB", "United States": "US",
    "United States Virgin Islands": "VI", "Uruguay": "UY",
    "Uzbekistan": "UZ", "Vanuatu": "VU", "Vatican City": "VA",
    "Venezuela": "VE", "Vietnam": "VN", "Viet Nam": "VN",
    "Wallis and Futuna": "WF", "Western Sahara": "EH", "Yemen": "YE",
    "Zambia": "ZM", "Zimbabwe": "ZW",
    # common alias/official-name variants a future wiki edit might use
    # (pycountry resolves these via its official/common name fields;
    # the full-dataset differential pins that the base table already
    # covers every name the current page uses)
    "United States of America": "US", "USA": "US",
    "Republic of Korea": "KR", "Korea, Republic of": "KR",
    "Burma": "MM", "Macedonia": "MK", "Swaziland": "SZ",
    "Republic of the Congo": "CG", "DR Congo": "CD",
    "The Gambia": "GM", "The Bahamas": "BS", "Holy See": "VA",
    "Republic of Moldova": "MD", "Great Britain": "GB",
    "Türkiye": "TR", "Turkey": "TR",
    # the remaining ISO 3166-1 entries (uninhabited territories and
    # codes the wiki page does not currently use) — completing the
    # table so a novel wiki row resolves instead of warning
    "Antarctica": "AQ", "Åland Islands": "AX", "Aland Islands": "AX",
    "Bonaire, Sint Eustatius and Saba": "BQ",
    "Caribbean Netherlands": "BQ", "Bouvet Island": "BV",
    "Micronesia": "FM", "Federated States of Micronesia": "FM",
    "Micronesia, Federated States of": "FM",
    "South Georgia and the South Sandwich Islands": "GS",
    "Heard Island and McDonald Islands": "HM",
    "Pitcairn": "PN", "Pitcairn Islands": "PN",
    "Palestine": "PS", "State of Palestine": "PS",
    "Palestine, State of": "PS",
    "Svalbard and Jan Mayen": "SJ",
    "French Southern Territories": "TF",
    "United States Minor Outlying Islands": "UM",
    # congo disambiguation the wiki could plausibly use
    "Democratic Republic of the Congo": "CD",
    "Congo, Democratic Republic of the": "CD",
    "Congo-Kinshasa": "CD", "Congo-Brazzaville": "CG",
}

_US_STATES = {
    "Alabama": "AL", "Alaska": "AK", "Arizona": "AZ", "Arkansas": "AR",
    "California": "CA", "Colorado": "CO", "Connecticut": "CT",
    "Delaware": "DE", "District of Columbia": "DC", "Florida": "FL",
    "Georgia": "GA", "Hawaii": "HI", "Idaho": "ID", "Illinois": "IL",
    "Indiana": "IN", "Iowa": "IA", "Kansas": "KS", "Kentucky": "KY",
    "Louisiana": "LA", "Maine": "ME", "Maryland": "MD",
    "Massachusetts": "MA", "Michigan": "MI", "Minnesota": "MN",
    "Mississippi": "MS", "Missouri": "MO", "Montana": "MT",
    "Nebraska": "NE", "Nevada": "NV", "New Hampshire": "NH",
    "New Jersey": "NJ", "New Mexico": "NM", "New York": "NY",
    "North Carolina": "NC", "North Dakota": "ND", "Ohio": "OH",
    "Oklahoma": "OK", "Oregon": "OR", "Pennsylvania": "PA",
    "Rhode Island": "RI", "South Carolina": "SC", "South Dakota": "SD",
    "Tennessee": "TN", "Texas": "TX", "Utah": "UT", "Vermont": "VT",
    "Virginia": "VA", "Washington": "WA", "West Virginia": "WV",
    "Wisconsin": "WI", "Wyoming": "WY",
}

_CA_PROVINCES = {
    "Alberta": "AB", "British Columbia": "BC", "Manitoba": "MB",
    "New Brunswick": "NB", "Newfoundland and Labrador": "NL",
    "Northwest Territories": "NT", "Nova Scotia": "NS", "Nunavut": "NU",
    "Ontario": "ON", "Prince Edward Island": "PE", "Quebec": "QC",
    "Saskatchewan": "SK", "Yukon": "YT",
}

_AU_STATES = {
    "Australian Capital Territory": "ACT", "New South Wales": "NSW",
    "Northern Territory": "NT", "Queensland": "QLD",
    "South Australia": "SA", "Tasmania": "TAS", "Victoria": "VIC",
    "Western Australia": "WA",
}

_DE_LAENDER = {
    "Baden-Württemberg": "BW", "Bavaria": "BY", "Berlin": "BE",
    "Brandenburg": "BB", "Bremen": "HB", "Hamburg": "HH",
    "Hesse": "HE", "Lower Saxony": "NI",
    "Mecklenburg-Vorpommern": "MV", "North Rhine-Westphalia": "NW",
    "Rhineland-Palatinate": "RP", "Saarland": "SL", "Saxony": "SN",
    "Saxony-Anhalt": "ST", "Schleswig-Holstein": "SH",
    "Thuringia": "TH",
}

SUBDIVISIONS: dict[tuple[str, str], str] = {}
for _name, _code in _US_STATES.items():
    SUBDIVISIONS[("US", _name)] = f"US-{_code}"
for _name, _code in _CA_PROVINCES.items():
    SUBDIVISIONS[("CA", _name)] = f"CA-{_code}"
for _name, _code in _AU_STATES.items():
    SUBDIVISIONS[("AU", _name)] = f"AU-{_code}"
for _name, _code in _DE_LAENDER.items():
    SUBDIVISIONS[("DE", _name)] = f"DE-{_code}"
SUBDIVISIONS.update(
    {
        ("GB", "Scotland"): "GB-SCT",
        ("GB", "Wales"): "GB-WLS",
        ("GB", "England"): "GB-ENG",
        ("GB", "Northern Ireland"): "GB-NIR",
        ("BS", "New Providence"): "BS-NP",
        ("BE", "Flanders"): "BE-VLG",
        ("BE", "Wallonia"): "BE-WAL",
        ("BE", "Brussels-Capital Region"): "BE-BRU",
        ("FM", "Kosrae"): "FM-KSA",
        ("FM", "Pohnpei"): "FM-PNI",
        ("FM", "Chuuk"): "FM-TRK",
        ("FM", "Yap"): "FM-YAP",
        ("NL", "Bonaire"): "NL-BQ1",
        ("NL", "Saba"): "NL-BQ2",
        ("NL", "Sint Eustatius"): "NL-BQ3",
    }
)
