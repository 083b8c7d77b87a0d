"""Synthetic source fixtures reproducing the reference's anomaly taxonomy
(FIXTURES.md §1-§4). Deterministic — no RNG, values are hand-picked to hit
every cleaning rule."""

from __future__ import annotations

import json
import os

SFCC_HEADER = (
    "sale_id,transaction_date,product_id,customer_id,customer_last_name,"
    "customer_first_name,customer_email,customer_address,customer_phone,"
    "email_optin,sms_optin"
)

# 202401: tabs-in-field, leading-space optin, empty phone, normal rows
SFCC_202401 = f"""{SFCC_HEADER}
S00001,2024-01-03,P000001,8275941,Dupont,Isabelle,isabelle.dupont@gmail.com,"9 Rue de Rivoli, 75001 Paris",0612345678,true,false
S00002,2024-01-05,P000002,8275942,Martin\tJean,Luc,luc.martin@gmail.com,"2 Av de l'Opera, 75002 Paris",,\ttrue,false
S00003,2024-01-09,P000001,8275943,Bernard,Emma, EMMA.Bernard@GMAIL.com ,"5 Rue du Bac, 75007 Paris",0798765432, true,false
"""

# 202402: corrupt row (leading space before quoted field shifts columns →
# quarantine), phone that fails the 9-digit rule, duplicate client email
SFCC_202402 = f"""{SFCC_HEADER}
S00004,2024-02-02,P000003,8275944,Petit,Nina,nina.petit@gmail.com,"1 Rue Cler, 75007 Paris",061234567,true,true
S00005,2024-02-10,P000002,8275941,Dupont,Isabelle,isabelle.dupont@gmail.com,"9 Rue de Rivoli, 75001 Paris",0612345678,false,false
S00006,2024-02-11,P000009,8275945,Leroy,Paul,paul.leroy@gmail.com, "3 Rue Oberkampf, 75011 Paris",0611112222,true,false
"""

CEGID_SALES = [
    # normal; line total = 2 × 10.90
    {"sale_id": "PA01240100001", "email": None, "transaction_date": "2024-01-05",
     "product_name": "Confiture Artisanale Abricot", "quantity": 2, "price": 21.8},
    # corrupt XXMO prefix → MO01...; has email (lands in Dim_Client)
    {"sale_id": "XXMO240100002", "email": "store.client@gmail.com",
     "transaction_date": "2024-01-06", "product_name": "Chocolat Noir 70% Madagascar",
     "quantity": 1, "price": 12.5},
    # invalid lowercase "x" price → NULL → repaired from product reference
    {"sale_id": "LY01240200001", "email": None, "transaction_date": "2024-02-07",
     "product_name": "Confiture Artisanale Abricot", "quantity": 2, "price": "x"},
    # duplicate sale_id pair → _2 suffix on the later one
    {"sale_id": "BO02240800001", "email": None, "transaction_date": "2024-08-01",
     "product_name": "Chocolat Noir 70% Madagascar", "quantity": 1, "price": 12.5},
    {"sale_id": "BO02240800001", "email": None, "transaction_date": "2024-08-03",
     "product_name": "Confiture Artisanale Abricot", "quantity": 1, "price": 10.9},
    # product missing from the reference → null FK, missing-product audit
    {"sale_id": "ST01240300001", "email": None, "transaction_date": "2024-03-02",
     "product_name": "Produit Fantome", "quantity": 1, "price": 5.0},
    # unrepairable prefix → NULL store id (counts as Online per Type rule)
    {"sale_id": "ZZZZ240300002", "email": "isabelle.dupont@gmail.com",
     "transaction_date": "2024-03-09", "product_name": "Chocolat Noir 70% Madagascar",
     "quantity": 1, "price": 12.5},
]

PRODUCTS_2024 = """product_id,product_name,price,category
P000001,Confiture Artisanale Abricot,10.90,confiserie
P000002,Chocolat Noir 70% Madagascar,12.50,confiserie
P000003,Comte 18 mois,21.00,fromage
P000004,Retired Wine,30.00,vin
"""

# 2025: overlapping ids (P000001 price changed → survivor), one new product
PRODUCTS_2025 = """product_id,product_name,price,category
P000001,Confiture Artisanale Abricot,11.50,confiserie
P000002,Chocolat Noir 70% Madagascar,12.50,confiserie
P000003,Comte 18 mois,21.00,fromage
P000005,Saucisson Truffe,15.00,charcuterie
"""

BOUTIQUES = '''store_id,store_name,address
PA01|Epicerie Fine Paris Marais|"12 Rue des Francs Bourgeois, 75003 Paris"
MO01|Epicerie Fine Montpellier|"8 Place de la Comedie, 34000 Montpellier"
LY01|Epicerie Fine Lyon|"22 Rue de la Republique, 69002 Lyon"
BO02|Epicerie Fine Bordeaux 2|"5 Cours de l'Intendance, 33000 Bordeaux"
ST01|Epicerie Fine Strasbourg|"3 Place Kleber, 67000 Strasbourg"
'''


def write_fixtures(root: str) -> dict[str, str]:
    sfcc_dir = os.path.join(root, "salesforces")
    cegid_dir = os.path.join(root, "cegid")
    prod_dir = os.path.join(root, "product")
    shop_dir = os.path.join(root, "boutiques")
    for d in (sfcc_dir, cegid_dir, prod_dir, shop_dir):
        os.makedirs(d, exist_ok=True)
    with open(os.path.join(sfcc_dir, "202401_sfcc_sales.csv"), "w") as f:
        f.write(SFCC_202401)
    with open(os.path.join(sfcc_dir, "202402_sfcc_sales.csv"), "w") as f:
        f.write(SFCC_202402)
    with open(os.path.join(cegid_dir, "2024_cegid_sales.json"), "w") as f:
        json.dump(CEGID_SALES, f, indent=1)
    with open(os.path.join(prod_dir, "2024_product_reference.csv"), "w") as f:
        f.write(PRODUCTS_2024)
    with open(os.path.join(prod_dir, "2025_product_reference.csv"), "w") as f:
        f.write(PRODUCTS_2025)
    with open(os.path.join(shop_dir, "2025_boutiques.csv"), "w") as f:
        f.write(BOUTIQUES)
    return {
        "sfcc_glob": os.path.join(sfcc_dir, "*_sfcc_sales.csv"),
        "cegid_path": os.path.join(cegid_dir, "2024_cegid_sales.json"),
        "products_glob": os.path.join(prod_dir, "*_product_reference.csv"),
        "boutiques_path": os.path.join(shop_dir, "2025_boutiques.csv"),
    }
