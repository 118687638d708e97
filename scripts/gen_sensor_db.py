"""Generate theiasfm_tpu/data/camera_sensor_database.txt.

Role parity with the reference's compiled-in sensor-width database
(ref: data/camera_sensor_database.txt embedded via
src/theia/CMakeLists.txt:50, consumed by sfm/exif_reader.cc:94-218).
The data here is independently authored from public sensor-format
knowledge: each camera model maps to its sensor format class, and each
format class to its width in mm. Output schema matches the reference
loader: "Make;Make Model;width_mm" with the model field embedding the
make (exif_reader.cc LoadSensorWidthDatabase splits on ';').

Run: python scripts/gen_sensor_db.py
"""
import os

# sensor format -> width (mm); standard optical-format sensor widths
F = {
    "1/3.6": 4.00, "1/3.2": 4.54, "1/3": 4.80, "1/2.9": 4.96,
    "1/2.7": 5.37, "1/2.6": 5.50, "1/2.55": 5.60, "1/2.5": 5.75,
    "1/2.4": 5.90, "1/2.35": 6.00, "1/1.5": 8.60, "1/4": 3.20,
    "1/2.33": 6.08, "1/2.3": 6.16, "1/2": 6.40, "1/1.9": 6.80,
    "1/1.8": 7.11, "1/1.76": 7.30, "1/1.7": 7.44, "1/1.65": 7.60,
    "1/1.63": 7.80, "1/1.6": 8.08, "2/3": 8.80, "1/1.2": 10.67,
    "1": 13.20, "4/3": 17.30, "1.5": 18.70, "aps-c-canon": 22.30,
    "foveon": 20.70, "aps-c-sony": 23.50, "aps-c": 23.60,
    "aps-c-wide": 23.70, "aps-h": 28.70, "ff": 36.00, "mf": 43.80,
}

# (make, format-or-mm, "model1|model2|...")  — model WITHOUT the make
# prefix unless the EXIF model string itself embeds it (e.g. Canon).
ENTRIES = [
    # ----------------------------------------------------------- Canon
    # PowerShot A series (early: 1/2.7 or 1/1.8; late: 1/2.3)
    ("Canon", "1/2.7", "PowerShot A10|PowerShot A20|PowerShot A30|"
     "PowerShot A40|PowerShot A50|PowerShot A60|PowerShot A70|"
     "PowerShot A75|PowerShot A100|PowerShot A200|PowerShot A300|"
     "PowerShot A310|PowerShot A400|PowerShot A410|PowerShot A420|"
     "PowerShot A430|PowerShot A440"),
    ("Canon", "1/2.5", "PowerShot A450|PowerShot A460|PowerShot A530|"
     "PowerShot A540|PowerShot A550|PowerShot A560|PowerShot A570 IS|"
     "PowerShot A580|PowerShot A590 IS|PowerShot A700|PowerShot A710 IS|"
     "PowerShot A720 IS|PowerShot A495|PowerShot A490|PowerShot A480"),
    ("Canon", "1/1.8", "PowerShot A80|PowerShot A85|PowerShot A95|"
     "PowerShot A510|PowerShot A520|PowerShot A610|PowerShot A620|"
     "PowerShot A630|PowerShot A640|PowerShot A650 IS|PowerShot A95"),
    ("Canon", "1/2.3", "PowerShot A800|PowerShot A810|PowerShot A1000 IS|"
     "PowerShot A1100 IS|PowerShot A1200|PowerShot A1300|"
     "PowerShot A1400|PowerShot A2000 IS|PowerShot A2100 IS|"
     "PowerShot A2200|PowerShot A2300|PowerShot A2400 IS|"
     "PowerShot A2500|PowerShot A2600|PowerShot A3000 IS|"
     "PowerShot A3100 IS|PowerShot A3200 IS|PowerShot A3300 IS|"
     "PowerShot A3400 IS|PowerShot A3500 IS|PowerShot A4000 IS"),
    # PowerShot S compacts
    ("Canon", "1/1.8", "PowerShot S30|PowerShot S40|PowerShot S45|"
     "PowerShot S50|PowerShot S60|PowerShot S70|PowerShot S80|"
     "PowerShot S90|PowerShot S100|PowerShot S110|PowerShot S200"),
    ("Canon", "1/1.7", "PowerShot S95|PowerShot S120"),
    ("Canon", "1/2.7", "PowerShot S230|PowerShot S330|PowerShot S300"),
    ("Canon", "1/2.5", "PowerShot S1 IS|PowerShot S2 IS|PowerShot S3 IS"),
    ("Canon", "1/2.3", "PowerShot S5 IS"),
    # PowerShot SD / ELPH (EXIF: "Canon PowerShot SDxxx")
    ("Canon", "1/2.5", "PowerShot SD100|PowerShot SD110|PowerShot SD200|"
     "PowerShot SD300|PowerShot SD400|PowerShot SD430|PowerShot SD450|"
     "PowerShot SD600|PowerShot SD630|PowerShot SD1000|"
     "PowerShot SD1100 IS|PowerShot SD750|PowerShot SD40|"
     "PowerShot SD30|PowerShot SD20|PowerShot SD10"),
    ("Canon", "1/1.8", "PowerShot SD500|PowerShot SD550|PowerShot SD700 IS|"
     "PowerShot SD800 IS|PowerShot SD850 IS|PowerShot SD900|"
     "PowerShot SD950 IS"),
    ("Canon", "1/2.3", "PowerShot SD770 IS|PowerShot SD780 IS|"
     "PowerShot SD790 IS|PowerShot SD1200 IS|PowerShot SD1300 IS|"
     "PowerShot SD1400 IS|PowerShot SD3500 IS|PowerShot SD4000 IS|"
     "PowerShot SD940 IS|PowerShot SD960 IS|PowerShot SD980 IS|"
     "PowerShot SD890 IS|PowerShot SD880 IS|PowerShot SD870 IS|"
     "PowerShot SD4500 IS"),
    # ELPH naming (post-2011)
    ("Canon", "1/2.3", "PowerShot ELPH 100 HS|PowerShot ELPH 110 HS|"
     "PowerShot ELPH 115 IS|PowerShot ELPH 130 IS|PowerShot ELPH 135|"
     "PowerShot ELPH 140 IS|PowerShot ELPH 150 IS|PowerShot ELPH 160|"
     "PowerShot ELPH 170 IS|PowerShot ELPH 180|PowerShot ELPH 190 IS|"
     "PowerShot ELPH 300 HS|PowerShot ELPH 310 HS|PowerShot ELPH 320 HS|"
     "PowerShot ELPH 330 HS|PowerShot ELPH 340 HS|PowerShot ELPH 350 HS|"
     "PowerShot ELPH 360 HS|PowerShot ELPH 500 HS|PowerShot ELPH 510 HS|"
     "PowerShot ELPH 520 HS|PowerShot ELPH 530 HS"),
    # DIGITAL IXUS (EXIF: "Canon DIGITAL IXUS 40")
    ("Canon", "1/2.7", "DIGITAL IXUS|DIGITAL IXUS II|DIGITAL IXUS IIs|"
     "DIGITAL IXUS v|DIGITAL IXUS v2|DIGITAL IXUS v3|DIGITAL IXUS 330|"
     "DIGITAL IXUS 300|DIGITAL IXUS 400|DIGITAL IXUS 430"),
    ("Canon", "1/2.5", "DIGITAL IXUS 30|DIGITAL IXUS 40|DIGITAL IXUS 50|"
     "DIGITAL IXUS 55|DIGITAL IXUS 60|DIGITAL IXUS 65|DIGITAL IXUS 70|"
     "DIGITAL IXUS 75|DIGITAL IXUS 80 IS|DIGITAL IXUS 82 IS|"
     "DIGITAL IXUS i|DIGITAL IXUS i5|DIGITAL IXUS i7|"
     "DIGITAL IXUS WIRELESS|DIGITAL IXUS 850 IS|DIGITAL IXUS 70"),
    ("Canon", "1/1.8", "DIGITAL IXUS 500|DIGITAL IXUS 700|"
     "DIGITAL IXUS 750|DIGITAL IXUS 800 IS|DIGITAL IXUS 900 Ti|"
     "DIGITAL IXUS 950 IS|DIGITAL IXUS 860 IS"),
    ("Canon", "1/2.3", "DIGITAL IXUS 85 IS|DIGITAL IXUS 90 IS|"
     "DIGITAL IXUS 95 IS|DIGITAL IXUS 100 IS|DIGITAL IXUS 105|"
     "DIGITAL IXUS 110 IS|DIGITAL IXUS 120 IS|DIGITAL IXUS 130|"
     "DIGITAL IXUS 200 IS|DIGITAL IXUS 210|DIGITAL IXUS 970 IS|"
     "DIGITAL IXUS 980 IS|DIGITAL IXUS 990 IS|IXUS 115 HS|IXUS 125 HS|"
     "IXUS 132|IXUS 140|IXUS 145|IXUS 150|IXUS 155|IXUS 160|IXUS 165|"
     "IXUS 170|IXUS 175|IXUS 180|IXUS 185|IXUS 220 HS|IXUS 230 HS|"
     "IXUS 240 HS|IXUS 255 HS|IXUS 265 HS|IXUS 275 HS|IXUS 285 HS|"
     "IXUS 300 HS|IXUS 310 HS|IXUS 500 HS|IXUS 510 HS|IXUS 1000 HS|"
     "IXUS 1100 HS"),
    # PowerShot SX
    ("Canon", "1/2.5", "PowerShot SX100 IS|PowerShot SX110 IS"),
    ("Canon", "1/2.3", "PowerShot SX120 IS|PowerShot SX130 IS|"
     "PowerShot SX150 IS|PowerShot SX160 IS|PowerShot SX170 IS|"
     "PowerShot SX200 IS|PowerShot SX210 IS|PowerShot SX220 HS|"
     "PowerShot SX230 HS|PowerShot SX240 HS|PowerShot SX260 HS|"
     "PowerShot SX270 HS|PowerShot SX280 HS|PowerShot SX400 IS|"
     "PowerShot SX410 IS|PowerShot SX420 IS|PowerShot SX430 IS|"
     "PowerShot SX500 IS|PowerShot SX510 HS|PowerShot SX520 HS|"
     "PowerShot SX530 HS|PowerShot SX540 HS|PowerShot SX600 HS|"
     "PowerShot SX610 HS|PowerShot SX620 HS|PowerShot SX700 HS|"
     "PowerShot SX710 HS|PowerShot SX720 HS|PowerShot SX730 HS|"
     "PowerShot SX740 HS|PowerShot SX1 IS|PowerShot SX10 IS|"
     "PowerShot SX20 IS|PowerShot SX30 IS|PowerShot SX40 HS|"
     "PowerShot SX50 HS|PowerShot SX60 HS|PowerShot SX70 HS"),
    # PowerShot G
    ("Canon", "1/1.8", "PowerShot G1|PowerShot G2|PowerShot G3|"
     "PowerShot G5|PowerShot G6|PowerShot G7|PowerShot G9"),
    ("Canon", "1/1.7", "PowerShot G10|PowerShot G11|PowerShot G12|"
     "PowerShot G15|PowerShot G16"),
    ("Canon", "1/2.3", "PowerShot D10|PowerShot D20|PowerShot D30|"
     "PowerShot E1|PowerShot N|PowerShot N100"),
    ("Canon", "1.5", "PowerShot G1 X|PowerShot G1 X Mark II"),
    ("Canon", "aps-c-canon", "PowerShot G1 X Mark III"),
    ("Canon", "1", "PowerShot G3 X|PowerShot G5 X|PowerShot G5 X Mark II|"
     "PowerShot G7 X|PowerShot G7 X Mark II|PowerShot G7 X Mark III|"
     "PowerShot G9 X|PowerShot G9 X Mark II"),
    ("Canon", "2/3", "PowerShot Pro1"),
    ("Canon", "1/1.8", "PowerShot Pro70|PowerShot Pro90 IS"),
    # EOS DSLRs
    ("Canon", "aps-c-canon", "EOS 7D|EOS 7D Mark II|EOS 20D|EOS 30D|"
     "EOS 40D|EOS 50D|EOS 60D|EOS 70D|EOS 77D|EOS 80D|EOS 90D|"
     "EOS 100D|EOS 200D|EOS 250D|EOS 300D DIGITAL|EOS 350D DIGITAL|"
     "EOS 400D DIGITAL|EOS 450D|EOS 500D|EOS 550D|EOS 600D|EOS 650D|"
     "EOS 700D|EOS 750D|EOS 760D|EOS 800D|EOS 850D|EOS 1000D|"
     "EOS 1100D|EOS 1200D|EOS 1300D|EOS 2000D|EOS 4000D|"
     "EOS DIGITAL REBEL|EOS DIGITAL REBEL XT|EOS DIGITAL REBEL XTi|"
     "EOS REBEL XS|EOS REBEL XSi|EOS REBEL T1i|EOS REBEL T2i|"
     "EOS REBEL T3|EOS REBEL T3i|EOS REBEL T4i|EOS REBEL T5|"
     "EOS REBEL T5i|EOS REBEL T6|EOS REBEL T6i|EOS REBEL T6s|"
     "EOS REBEL T7|EOS REBEL T7i|EOS REBEL T8i|EOS REBEL SL1|"
     "EOS REBEL SL2|EOS REBEL SL3|EOS Kiss Digital|EOS Kiss Digital N|"
     "EOS Kiss Digital X|EOS Kiss X2|EOS Kiss X3|EOS Kiss X4|"
     "EOS Kiss X5|EOS Kiss X6i|EOS Kiss X7|EOS Kiss X7i|EOS Kiss X8i|"
     "EOS Kiss X9|EOS Kiss X9i|EOS D30|EOS D60|EOS 10D|"
     "EOS M|EOS M2|EOS M3|EOS M5|EOS M6|EOS M6 Mark II|EOS M10|"
     "EOS M50|EOS M50 Mark II|EOS M100|EOS M200|EOS R7|EOS R10|"
     "EOS R50|EOS R100"),
    ("Canon", "aps-h", "EOS-1D|EOS-1D Mark II|EOS-1D Mark II N|"
     "EOS-1D Mark III|EOS-1D Mark IV"),
    ("Canon", "ff", "EOS 5D|EOS 5D Mark II|EOS 5D Mark III|"
     "EOS 5D Mark IV|EOS 5DS|EOS 5DS R|EOS 6D|EOS 6D Mark II|"
     "EOS-1Ds|EOS-1Ds Mark II|EOS-1Ds Mark III|EOS-1D X|"
     "EOS-1D X Mark II|EOS-1D X Mark III|EOS R|EOS RP|EOS R5|EOS R6|"
     "EOS R6 Mark II|EOS R8|EOS R3"),
    # ----------------------------------------------------------- Nikon
    ("Nikon", "aps-c", "D1|D1H|D1X|D2H|D2Hs|D2X|D2Xs|D100|D200|D300|"
     "D300S|D500|D40|D40X|D50|D60|D70|D70s|D80|D90|D3000|D3100|D3200|"
     "D3300|D3400|D3500|D5000|D5100|D5200|D5300|D5500|D5600|D7000|"
     "D7100|D7200|D7500|Z 50|Z fc|Z 30"),
    ("Nikon", "ff", "D3|D3S|D3X|D4|D4S|D5|D6|D600|D610|D700|D750|D780|"
     "D800|D800E|D810|D850|Df|Z 5|Z 6|Z 6_2|Z 7|Z 7_2|Z 8|Z 9"),
    ("Nikon", "1", "1 J1|1 J2|1 J3|1 J4|1 J5|1 V1|1 V2|1 V3|1 S1|1 S2|"
     "1 AW1"),
    # Coolpix: EXIF model strings are like "COOLPIX S9100" / "E995"
    ("Nikon", "1/2", "E990|E995|E950|E900"),
    ("Nikon", "1/1.8", "E4300|E4500|E5000|E5400|E5700|E8700|E8400|"
     "E8800|E7900|E7600|E5900"),
    ("Nikon", "1/2.7", "E2100|E2200|E2500|E3100|E3200|E3700|E775|E885|"
     "E800|E700"),
    ("Nikon", "1/2.5", "E4600|E5600|E4100|E4200|E5200|E3600|"
     "COOLPIX L1|COOLPIX L2|COOLPIX L3|COOLPIX L4|COOLPIX L5|"
     "COOLPIX L6|COOLPIX L10|COOLPIX L11|COOLPIX L12|COOLPIX L14|"
     "COOLPIX L15|COOLPIX L16|COOLPIX L18|COOLPIX S1|COOLPIX S2|"
     "COOLPIX S3|COOLPIX S4|COOLPIX S5|COOLPIX S6|COOLPIX S7|"
     "COOLPIX S7c|COOLPIX S9|COOLPIX S10|COOLPIX S50|COOLPIX S50c|"
     "COOLPIX S200|COOLPIX S500|COOLPIX S700|COOLPIX P1|COOLPIX P2|"
     "COOLPIX P3|COOLPIX P4|COOLPIX P50|COOLPIX S220|COOLPIX S210"),
    ("Nikon", "1/2.3", "COOLPIX L19|COOLPIX L20|COOLPIX L21|"
     "COOLPIX L22|COOLPIX L23|COOLPIX L24|COOLPIX L25|COOLPIX L26|"
     "COOLPIX L27|COOLPIX L28|COOLPIX L29|COOLPIX L30|COOLPIX L31|"
     "COOLPIX L32|COOLPIX L100|COOLPIX L110|COOLPIX L120|"
     "COOLPIX L310|COOLPIX L320|COOLPIX L330|COOLPIX L340|"
     "COOLPIX L610|COOLPIX L810|COOLPIX L820|COOLPIX L830|"
     "COOLPIX L840|COOLPIX S230|COOLPIX S3000|COOLPIX S3100|"
     "COOLPIX S3200|COOLPIX S3300|COOLPIX S3500|COOLPIX S3600|"
     "COOLPIX S3700|COOLPIX S4000|COOLPIX S4100|COOLPIX S4150|"
     "COOLPIX S4200|COOLPIX S4300|COOLPIX S5100|COOLPIX S5200|"
     "COOLPIX S5300|COOLPIX S6000|COOLPIX S6100|COOLPIX S6150|"
     "COOLPIX S6200|COOLPIX S6300|COOLPIX S6400|COOLPIX S6500|"
     "COOLPIX S6800|COOLPIX S6900|COOLPIX S7000|COOLPIX S8000|"
     "COOLPIX S8100|COOLPIX S8200|COOLPIX S9050|COOLPIX S9100|"
     "COOLPIX S9200|COOLPIX S9300|COOLPIX S9400|COOLPIX S9500|"
     "COOLPIX S9700|COOLPIX S9900|COOLPIX S2500|COOLPIX S2600|"
     "COOLPIX S2700|COOLPIX S2750|COOLPIX S2800|COOLPIX S2900|"
     "COOLPIX S30|COOLPIX S31|COOLPIX S32|COOLPIX S33|COOLPIX S100|"
     "COOLPIX S80|COOLPIX S different|COOLPIX P60|COOLPIX P80|"
     "COOLPIX P90|COOLPIX P100|COOLPIX P500|COOLPIX P510|"
     "COOLPIX P520|COOLPIX P530|COOLPIX P600|COOLPIX P610|"
     "COOLPIX P900|COOLPIX P950|COOLPIX B500|COOLPIX B600|"
     "COOLPIX B700|COOLPIX W100|COOLPIX W150|COOLPIX W300|"
     "COOLPIX AW100|COOLPIX AW110|COOLPIX AW120|COOLPIX AW130|"
     "COOLPIX S01|COOLPIX S02"),
    ("Nikon", "1/1.7", "COOLPIX P300|COOLPIX P310|COOLPIX P330|"
     "COOLPIX P340|COOLPIX P5000|COOLPIX P5100|COOLPIX P6000|"
     "COOLPIX P7000|COOLPIX P7100|COOLPIX P7700|COOLPIX P7800"),
    ("Nikon", "aps-c", "COOLPIX A"),
    ("Nikon", "1", "COOLPIX A900|COOLPIX A1000"),
    # ------------------------------------------------------------ Sony
    ("Sony", "1/2.7", "DSC-P32|DSC-P52|DSC-P72|DSC-P73|DSC-P92|"
     "DSC-P93|DSC-P41|DSC-P43|DSC-U10|DSC-U20|DSC-U30|DSC-U40|"
     "DSC-U50|DSC-P31|DSC-P51|DSC-P71"),
    ("Sony", "1/1.8", "DSC-P100|DSC-P120|DSC-P150|DSC-P200|DSC-V1|"
     "DSC-W1|DSC-W5|DSC-W7|DSC-W12|DSC-S75|DSC-S85|DSC-P8|DSC-P10|"
     "DSC-P12|DSC-T7"),
    ("Sony", "1/2.5", "DSC-T1|DSC-T3|DSC-T5|DSC-T9|DSC-T10|DSC-T11|"
     "DSC-T33|DSC-S40|DSC-S60|DSC-S80|DSC-S90|DSC-S500|DSC-S600|"
     "DSC-S650|DSC-S700|DSC-S730|DSC-S750|DSC-W30|DSC-W35|DSC-W40|"
     "DSC-W50|DSC-W55|DSC-W70|DSC-W80|DSC-W90|DSC-W100|DSC-W110|"
     "DSC-W115|DSC-W120|DSC-W125|DSC-W130|DSC-H1|DSC-H2|DSC-H5|"
     "DSC-H7|DSC-H9|DSC-H10|DSC-T20|DSC-T25|DSC-T30|DSC-T50|"
     "DSC-T70|DSC-T75|DSC-T77|DSC-T90|DSC-T100|DSC-T110|DSC-T200|"
     "DSC-T300|DSC-T500|DSC-T700|DSC-T900"),
    ("Sony", "1/2.3", "DSC-W150|DSC-W170|DSC-W180|DSC-W190|DSC-W210|"
     "DSC-W215|DSC-W220|DSC-W230|DSC-W270|DSC-W290|DSC-W310|"
     "DSC-W320|DSC-W330|DSC-W350|DSC-W360|DSC-W380|DSC-W510|"
     "DSC-W520|DSC-W530|DSC-W550|DSC-W560|DSC-W570|DSC-W610|"
     "DSC-W620|DSC-W630|DSC-W650|DSC-W690|DSC-W710|DSC-W730|"
     "DSC-W800|DSC-W810|DSC-W830|DSC-H20|DSC-H50|DSC-H55|DSC-H70|"
     "DSC-H90|DSC-H200|DSC-H300|DSC-H400|DSC-HX1|DSC-HX5V|DSC-HX7V|"
     "DSC-HX9V|DSC-HX10V|DSC-HX20V|DSC-HX30V|DSC-HX50V|DSC-HX60V|"
     "DSC-HX80|DSC-HX90V|DSC-HX100V|DSC-HX200V|DSC-HX300|DSC-HX350|"
     "DSC-HX400V|DSC-WX1|DSC-WX5|DSC-WX7|DSC-WX9|DSC-WX50|DSC-WX60|"
     "DSC-WX80|DSC-WX100|DSC-WX150|DSC-WX220|DSC-WX300|DSC-WX350|"
     "DSC-WX500|DSC-TX1|DSC-TX5|DSC-TX7|DSC-TX9|DSC-TX10|DSC-TX20|"
     "DSC-TX30|DSC-TX55|DSC-TX66|DSC-TX100V|DSC-TX200V|DSC-S930|"
     "DSC-S950|DSC-S980|DSC-S2000|DSC-S2100|DSC-S3000|DSC-S5000"),
    ("Sony", "1/1.7", "DSC-V3"),
    ("Sony", "2/3", "DSC-F828|DSC-F717|DSC-F707|DSC-R1 "),
    ("Sony", "1", "DSC-RX100|DSC-RX100M2|DSC-RX100M3|DSC-RX100M4|"
     "DSC-RX100M5|DSC-RX100M5A|DSC-RX100M6|DSC-RX100M7|DSC-RX10|"
     "DSC-RX10M2|DSC-RX10M3|DSC-RX10M4|ZV-1"),
    ("Sony", "ff", "DSC-RX1|DSC-RX1R|DSC-RX1RM2"),
    ("Sony", "aps-c-sony", "DSLR-A100|DSLR-A200|DSLR-A230|DSLR-A290|"
     "DSLR-A300|DSLR-A330|DSLR-A350|DSLR-A380|DSLR-A390|DSLR-A450|"
     "DSLR-A500|DSLR-A550|DSLR-A560|DSLR-A580|DSLR-A700|SLT-A33|"
     "SLT-A35|SLT-A37|SLT-A55V|SLT-A57|SLT-A58|SLT-A65V|SLT-A77V|"
     "ILCA-77M2|NEX-3|NEX-C3|NEX-F3|NEX-3N|NEX-5|NEX-5N|NEX-5R|"
     "NEX-5T|NEX-6|NEX-7|ILCE-3000|ILCE-3500|ILCE-5000|ILCE-5100|"
     "ILCE-6000|ILCE-6100|ILCE-6300|ILCE-6400|ILCE-6500|ILCE-6600|"
     "ILCE-QX1|ZV-E10"),
    ("Sony", "ff", "DSLR-A850|DSLR-A900|SLT-A99V|ILCE-7|ILCE-7M2|"
     "ILCE-7M3|ILCE-7M4|ILCE-7R|ILCE-7RM2|ILCE-7RM3|ILCE-7RM4|"
     "ILCE-7S|ILCE-7SM2|ILCE-7SM3|ILCE-7C|ILCE-9|ILCE-9M2|ILCE-1"),
    # --------------------------------------------------------- Olympus
    ("Olympus", "1/2.7", "C120|C150|C160|C220|C300|C310|C350|C360|"
     "C450|C460|C350Z|C310Z|C160Z|D-390|D-395|D-435|D-520|D-535|"
     "D-540|D-545|FE100|FE110|FE115|FE120|FE130|FE140"),
    ("Olympus", "1/2.5", "C470Z|C500|C510|C540|C550|FE150|FE160|"
     "FE170|FE180|FE190|FE200|FE210|FE220|FE230|FE240|FE250|FE270|"
     "FE280|FE290|FE300|FE310|FE320|FE340|FE350|FE360|SP-500UZ|"
     "SP-510UZ|SP-550UZ|SP-560UZ|SP-570UZ|SP-600UZ|SP-610UZ|"
     "u700|u710|u720SW|u725SW|u730|u740|u750|u760|u770SW|u780|u790SW|"
     "u795SW|u800|u810|u820|u830|u840|u850SW|u1000|u1200"),
    ("Olympus", "1/2.3", "FE-4000|FE-4010|FE-4020|FE-4030|FE-45|"
     "FE-47|FE-5010|FE-5020|FE-5030|FE-5035|SP-620UZ|SP-720UZ|"
     "SP-800UZ|SP-810UZ|SP-100EE|SZ-10|SZ-11|SZ-12|SZ-14|SZ-15|"
     "SZ-16|SZ-20|SZ-30MR|SZ-31MR|TG-310|TG-320|TG-610|TG-620|"
     "TG-630|TG-810|TG-820|TG-830|TG-850|TG-860|TG-870|TG-1|TG-2|"
     "TG-3|TG-4|TG-5|TG-6|VR310|VR320|VR330|VG110|VG120|VG130|"
     "VG145|VG160|VG170|u1050SW|u1060|u1070|u5000|u7000|u7010|"
     "u7030|u7040|u7050|u9000|u9010|u-7700|u-7720|u-7730|STYLUS1"),
    ("Olympus", "1/1.8", "C2000Z|C2020Z|C2040Z|C3000Z|C3030Z|C3040Z|"
     "C4000Z|C4040Z|C4100Z|C5050Z|C40Z|C5000Z|C60Z|C70Z|C7000Z|"
     "u300|u400|u410|u500|u600|u810|SP-310|SP-320|SP-350"),
    ("Olympus", "2/3", "C5060WZ|C7070WZ|C8080WZ|E-10|E-20,E-20N,E-20P"),
    ("Olympus", "1/1.7", "XZ-1|XZ-2|XZ-10|SH-1|SH-2|SH-50|SH-60"),
    ("Olympus", "4/3", "E-1|E-3|E-5|E-30|E-300|E-330|E-400|E-410|"
     "E-420|E-450|E-500|E-510|E-520|E-600|E-620|E-P1|E-P2|E-P3|"
     "E-P5|E-PL1|E-PL2|E-PL3|E-PL5|E-PL6|E-PL7|E-PL8|E-PL9|E-PL10|"
     "E-PM1|E-PM2|E-M1|E-M1MarkII|E-M1MarkIII|E-M1X|E-M5|"
     "E-M5MarkII|E-M5MarkIII|E-M10|E-M10MarkII|E-M10MarkIII|"
     "E-M10MarkIV|PEN-F"),
    # ------------------------------------------------------- Panasonic
    ("Panasonic", "1/2.5", "DMC-FZ1|DMC-FZ2|DMC-FZ3|DMC-FZ4|DMC-FZ5|"
     "DMC-FZ7|DMC-FZ8|DMC-LZ1|DMC-LZ2|DMC-LZ3|DMC-LZ5|DMC-LZ6|"
     "DMC-LZ7|DMC-LZ8|DMC-LZ10|DMC-LS1|DMC-LS2|DMC-LS3|DMC-LS60|"
     "DMC-LS70|DMC-LS75|DMC-LS80|DMC-FX01|DMC-FX07|DMC-FX2|DMC-FX3|"
     "DMC-FX5|DMC-FX7|DMC-FX8|DMC-FX9|DMC-FX10|DMC-FX12|DMC-FX50|"
     "DMC-FX55|DMC-TZ1|DMC-TZ2|DMC-TZ3|DMC-FS20|DMC-F1|DMC-F3|"
     "DMC-F5|DMC-F7"),
    ("Panasonic", "1/2.33", "DMC-FZ18|DMC-FZ28|DMC-FZ35|DMC-FZ38|"
     "DMC-FZ40|DMC-FZ45|DMC-FZ47|DMC-FZ48|DMC-FZ60|DMC-FZ62|"
     "DMC-FZ70|DMC-FZ72|DMC-FZ80|DMC-FZ82|DMC-TZ4|DMC-TZ5|DMC-TZ6|"
     "DMC-TZ7|DMC-TZ8|DMC-TZ10|DMC-TZ18|DMC-TZ19|DMC-TZ20|DMC-TZ22|"
     "DMC-TZ25|DMC-TZ27|DMC-TZ30|DMC-TZ31|DMC-TZ35|DMC-TZ36|"
     "DMC-TZ40|DMC-TZ41|DMC-TZ55|DMC-TZ56|DMC-TZ57|DMC-TZ58|"
     "DMC-TZ60|DMC-TZ61|DMC-TZ70|DMC-TZ71|DMC-TZ80|DMC-TZ81|"
     "DMC-ZS1|DMC-ZS3|DMC-ZS5|DMC-ZS7|DMC-ZS8|DMC-ZS10|DMC-ZS15|"
     "DMC-ZS19|DMC-ZS20|DMC-ZS25|DMC-ZS30|DMC-ZS35|DMC-ZS40|"
     "DMC-ZS45|DMC-ZS50|DMC-ZS60|DMC-FS3|DMC-FS5|DMC-FS6|DMC-FS7|"
     "DMC-FS10|DMC-FS11|DMC-FS12|DMC-FS15|DMC-FS16|DMC-FS25|"
     "DMC-FS28|DMC-FS30|DMC-FS35|DMC-FS37|DMC-FS40|DMC-FS42|"
     "DMC-FS45|DMC-FS62|DMC-FH1|DMC-FH2|DMC-FH3|DMC-FH4|DMC-FH5|"
     "DMC-FH6|DMC-FH7|DMC-FH8|DMC-FH10|DMC-FH20|DMC-FH22|DMC-FH25|"
     "DMC-FH27|DMC-FX33|DMC-FX35|DMC-FX36|DMC-FX37|DMC-FX38|"
     "DMC-FX40|DMC-FX48|DMC-FX60|DMC-FX65|DMC-FX66|DMC-FX68|"
     "DMC-FX70|DMC-FX75|DMC-FX78|DMC-FX80|DMC-FX90|DMC-FX100|"
     "DMC-FX150|DMC-FX500|DMC-FX520|DMC-FX550|DMC-FX580|DMC-FT1|"
     "DMC-FT2|DMC-FT3|DMC-FT4|DMC-FT5|DMC-FT25|DMC-FT30|DMC-TS1|"
     "DMC-TS2|DMC-TS3|DMC-TS4|DMC-TS5|DMC-TS20|DMC-TS25|DMC-TS30|"
     "DMC-SZ1|DMC-SZ3|DMC-SZ5|DMC-SZ7|DMC-SZ8|DMC-SZ9|DMC-SZ10|"
     "DMC-XS1|DMC-XS3|DMC-3D1"),
    ("Panasonic", "1/1.65", "DMC-LX2|DMC-LX1"),
    ("Panasonic", "1/1.63", "DMC-LX3|DMC-LX5"),
    ("Panasonic", "1/1.7", "DMC-LX7"),
    ("Panasonic", "1", "DMC-LX10|DMC-LX15|DMC-FZ1000|DMC-FZ2000|"
     "DMC-FZ2500|DC-FZ1000M2|DMC-ZS100|DMC-ZS110|DMC-TZ100|"
     "DMC-TZ110|DC-TZ200|DC-ZS200"),
    ("Panasonic", "4/3", "DMC-LX100|DC-LX100M2|DMC-G1|DMC-G2|DMC-G3|"
     "DMC-G5|DMC-G6|DMC-G7|DMC-G80|DMC-G81|DMC-G85|DC-G9|DC-G90|"
     "DC-G95|DC-G100|DMC-GF1|DMC-GF2|DMC-GF3|DMC-GF5|DMC-GF6|"
     "DMC-GF7|DMC-GF8|DC-GF9|DC-GF10|DMC-GH1|DMC-GH2|DMC-GH3|"
     "DMC-GH4|DC-GH5|DC-GH5S|DC-GH6|DMC-GM1|DMC-GM5|DMC-GX1|"
     "DMC-GX7|DMC-GX8|DMC-GX80|DMC-GX85|DC-GX9|DMC-G10"),
    ("Panasonic", "ff", "DC-S1|DC-S1R|DC-S1H|DC-S5"),
    # -------------------------------------------------------- Fujifilm
    ("Fujifilm", "1/2.7", "FinePix A101|FinePix A201|FinePix A202|"
     "FinePix A203|FinePix A204|FinePix A205|FinePix A210|"
     "FinePix A303|FinePix A310|FinePix A330|FinePix A340|"
     "FinePix 2600Zoom|FinePix 2650|FinePix 2800ZOOM|FinePix A120|"
     "FinePix 1400Zoom|FinePix 1300|FinePix 2400Zoom"),
    ("Fujifilm", "1/2.5", "FinePix A345|FinePix A350|FinePix A400|"
     "FinePix A500|FinePix A600|FinePix A610|FinePix A700|"
     "FinePix A800|FinePix A820|FinePix A825|FinePix A850|"
     "FinePix A900|FinePix A920|FinePix Z1|FinePix Z2|FinePix Z3|"
     "FinePix Z5fd|FinePix Z10fd|FinePix Z20fd|FinePix J10|"
     "FinePix J12|FinePix J15fd|FinePix J20|FinePix J25|FinePix J26|"
     "FinePix J27|FinePix J28|FinePix J29|FinePix J30|FinePix J32|"
     "FinePix J35|FinePix J38|FinePix E500|FinePix E510|"
     "FinePix F460|FinePix F470|FinePix F480|FinePix S5700|"
     "FinePix S5800|FinePix S700|FinePix S800"),
    ("Fujifilm", "1/2.3", "FinePix Z30|FinePix Z33WP|FinePix Z35|"
     "FinePix Z37|FinePix Z70|FinePix Z80|FinePix Z90|FinePix Z100fd|"
     "FinePix Z200fd|FinePix Z300|FinePix Z700EXR|FinePix Z800EXR|"
     "FinePix Z900EXR|FinePix Z950EXR|FinePix J110W|FinePix J120|"
     "FinePix J150W|FinePix J210|FinePix J250|FinePix JV100|"
     "FinePix JV150|FinePix JV200|FinePix JV250|FinePix JV300|"
     "FinePix JX200|FinePix JX250|FinePix JX280|FinePix JX300|"
     "FinePix JX350|FinePix JX370|FinePix JX400|FinePix JX420|"
     "FinePix JX500|FinePix JX520|FinePix JX550|FinePix JX580|"
     "FinePix JX660|FinePix JZ100|FinePix JZ110|FinePix JZ200|"
     "FinePix JZ250|FinePix JZ300|FinePix JZ305|FinePix JZ500|"
     "FinePix JZ505|FinePix S1000fd|FinePix S1500|FinePix S1600|"
     "FinePix S1700|FinePix S1800|FinePix S1900|FinePix S2000HD|"
     "FinePix S2500HD|FinePix S2800HD|FinePix S2950|FinePix S2980|"
     "FinePix S3200|FinePix S3300|FinePix S3400|FinePix S3450|"
     "FinePix S4000|FinePix S4050|FinePix S4200|FinePix S4300|"
     "FinePix S4400|FinePix S4500|FinePix S4600|FinePix S4700|"
     "FinePix S4800|FinePix S6600|FinePix S6700|FinePix S6800|"
     "FinePix S8000fd|FinePix S8100fd|FinePix S8200|FinePix S8300|"
     "FinePix S8400|FinePix S8500|FinePix S8600|FinePix S9400W|"
     "FinePix S9800|FinePix S9900W|FinePix SL240|FinePix SL260|"
     "FinePix SL280|FinePix SL300|FinePix SL1000|FinePix T200|"
     "FinePix T300|FinePix T350|FinePix T400|FinePix T500|"
     "FinePix T550|FinePix XP10|FinePix XP20|FinePix XP30|"
     "FinePix XP50|FinePix XP60|FinePix XP70|FinePix XP80|"
     "FinePix XP90|FinePix XP120|FinePix XP130|FinePix XP140|"
     "FinePix AV100|FinePix AV105|FinePix AV110|FinePix AV150|"
     "FinePix AV200|FinePix AV250|FinePix AX200|FinePix AX250|"
     "FinePix AX300|FinePix AX350|FinePix AX500|FinePix AX650|"
     "FinePix REAL 3D W1|FinePix REAL 3D W3"),
    ("Fujifilm", "1/2", "FinePix F10|FinePix F11|FinePix F20|"
     "FinePix F30|FinePix F31fd|FinePix F40fd|FinePix F45fd|"
     "FinePix F50fd|FinePix F60fd|FinePix F70EXR|FinePix F75EXR|"
     "FinePix F80EXR|FinePix F85EXR|FinePix F100fd|FinePix F200EXR|"
     "FinePix F300EXR|FinePix F305EXR|FinePix F500EXR|"
     "FinePix F550EXR|FinePix F600EXR|FinePix F605EXR|"
     "FinePix F660EXR|FinePix F750EXR|FinePix F770EXR|"
     "FinePix F800EXR|FinePix F850EXR|FinePix F900EXR|"
     "FinePix HS10|FinePix HS11|FinePix HS20EXR|FinePix HS25EXR|"
     "FinePix HS30EXR|FinePix HS35EXR|FinePix HS50EXR|"
     "FinePix S100FS|FinePix S205EXR|XF1|XQ1|XQ2"),
    ("Fujifilm", "1/1.7", "FinePix E550|FinePix E900|FinePix F601 ZOOM|"
     "FinePix F700|FinePix F710|FinePix F810|FinePix S20Pro|"
     "FinePix S5000|FinePix S5100|FinePix S5200|FinePix S5500|"
     "FinePix S5600|FinePix S6000fd|FinePix S6500fd|FinePix S7000|"
     "FinePix S602 ZOOM"),
    ("Fujifilm", "2/3", "FinePix S9000|FinePix S9100|FinePix S9500|"
     "FinePix S9600|X10|X20|X30|XF10|X-S1"),
    ("Fujifilm", "aps-c", "FinePix S1Pro|FinePix S2Pro|FinePix S3Pro|"
     "FinePix S5Pro|FinePix X100|X100S|X100T|X100F|X100V|X-Pro1|"
     "X-Pro2|X-Pro3|X-E1|X-E2|X-E2S|X-E3|X-E4|X-M1|X-A1|X-A2|X-A3|"
     "X-A5|X-A7|X-A10|X-T1|X-T2|X-T3|X-T4|X-T10|X-T20|X-T30|"
     "X-T100|X-T200|X-H1|X-S10"),
    ("Fujifilm", "mf", "GFX 50S|GFX 50R|GFX100|GFX100S"),
    # ----------------------------------------------------------- Kodak
    ("Kodak", "1/2.7", "EASYSHARE CX4200|EASYSHARE CX4210|"
     "EASYSHARE CX4230|EASYSHARE CX4300|EASYSHARE CX6200|"
     "EASYSHARE CX6230|EASYSHARE CX6330|EASYSHARE CX6445|"
     "EASYSHARE CX7220|EASYSHARE CX7300|EASYSHARE CX7310|"
     "EASYSHARE CX7330|EASYSHARE CX7430|EASYSHARE CX7525|"
     "EASYSHARE CX7530|EASYSHARE DX3500|EASYSHARE DX3600|"
     "EASYSHARE DX3700|EASYSHARE DX3900|EASYSHARE DX4330|"
     "EASYSHARE DX4530|EASYSHARE DX4900|EASYSHARE C300|"
     "EASYSHARE C310|EASYSHARE C315|EASYSHARE C330|EASYSHARE C340|"
     "EASYSHARE C360|EASYSHARE C433|EASYSHARE C503|EASYSHARE C530|"
     "EASYSHARE C533|EASYSHARE C610|EASYSHARE C643|EASYSHARE C653|"
     "EASYSHARE C663|EASYSHARE C703|EASYSHARE C743|EASYSHARE C753|"
     "EASYSHARE C763|EASYSHARE C813 ZOOM|EASYSHARE C875|"
     "EASYSHARE C1013|EASYSHARE CD33|EASYSHARE CD40|EASYSHARE CD43|"
     "EASYSHARE CD703|EASYSHARE CD803"),
    ("Kodak", "1/2.5", "EASYSHARE C140|EASYSHARE C150|EASYSHARE C160|"
     "EASYSHARE C170|EASYSHARE C180|EASYSHARE C182|EASYSHARE C190|"
     "EASYSHARE C195|EASYSHARE C513|EASYSHARE C613|EASYSHARE C623|"
     "EASYSHARE C713|EASYSHARE C913|EASYSHARE M320|EASYSHARE M340|"
     "EASYSHARE M341|EASYSHARE M380|EASYSHARE M381|EASYSHARE M420|"
     "EASYSHARE M522|EASYSHARE M530|EASYSHARE M531|EASYSHARE M532|"
     "EASYSHARE M550|EASYSHARE M552|EASYSHARE M575|EASYSHARE M580|"
     "EASYSHARE M583|EASYSHARE M750|EASYSHARE M853|EASYSHARE M863|"
     "EASYSHARE M873|EASYSHARE M883|EASYSHARE M893 IS|"
     "EASYSHARE M1033|EASYSHARE M1063|EASYSHARE M1073 IS|"
     "EASYSHARE MD30|EASYSHARE MD41|EASYSHARE MD81|"
     "EASYSHARE MX1063|EASYSHARE V803|EASYSHARE V1003|"
     "EASYSHARE Z700|EASYSHARE Z710|EASYSHARE Z740|EASYSHARE Z885|"
     "EASYSHARE Z915|EASYSHARE Z950|EASYSHARE Z1012 IS|"
     "EASYSHARE Z1015 IS|EASYSHARE Z1085 IS|EASYSHARE Z1275|"
     "EASYSHARE Z1285|EASYSHARE Z1485 IS|EASYSHARE Z5010|"
     "EASYSHARE Z5120|EASYSHARE Z712 IS|EASYSHARE Z812 IS|"
     "EASYSHARE Z8612 IS|EASYSHARE Z980|EASYSHARE Z981|"
     "EASYSHARE Z990|EASYSHARE ZD710|EASYSHARE ZD8612 IS|"
     "EASYSHARE TOUCH|EASYSHARE MINI|EASYSHARE SPORT"),
    ("Kodak", "1/1.8", "EASYSHARE DX6490|EASYSHARE DX7440|"
     "EASYSHARE DX7590|EASYSHARE DX7630|EASYSHARE P712|"
     "EASYSHARE P850|EASYSHARE P880|EASYSHARE V530|EASYSHARE V550|"
     "EASYSHARE V570|EASYSHARE V603|EASYSHARE V610|EASYSHARE V705|"
     "EASYSHARE Z730|EASYSHARE Z760|EASYSHARE Z7590"),
    ("Kodak", "1/1.7", "EASYSHARE Z1ports"),
    # ----------------------------------------------------------- Casio
    ("Casio", "1/2.7", "QV-R40|QV-R41|QV-R51|QV-R52|QV-R61|QV-R62|"
     "QV-2000UX|QV-2100|QV-2300UX|QV-2400UX|QV-2800UX|QV-2900UX|"
     "QV-3000EX|QV-3500EX|QV-4000|QV-5700|EX-S1|EX-S2|EX-S3|EX-M1|"
     "EX-M2|EX-M20|EX-Z3|EX-Z4|EX-Z5|EX-Z6|EX-Z7|EX-Z8|EX-Z11|"
     "EX-Z30|EX-Z40|EX-Z50|EX-Z55|EX-Z60|EX-Z65|EX-Z70|EX-Z75|"
     "EX-Z77|EX-S20|EX-S100|EX-S500|EX-S600|EX-S770|EX-S880"),
    ("Casio", "1/2.5", "EX-Z80|EX-Z85|EX-Z90|EX-Z100|EX-Z110|"
     "EX-Z120|EX-Z150|EX-Z200|EX-Z250|EX-Z300|EX-Z400|EX-Z500|"
     "EX-Z600|EX-Z700|EX-Z750|EX-Z800|EX-Z850|EX-Z1000|EX-Z1050|"
     "EX-Z1080|EX-Z1200|EX-S5|EX-S6|EX-S7|EX-S8|EX-S10|EX-S12|"
     "EX-V7|EX-V8|EX-P505|EX-P600|EX-P700"),
    ("Casio", "1/2.3", "EX-Z16|EX-Z19|EX-Z20|EX-Z21|EX-Z25|EX-Z26|"
     "EX-Z28|EX-Z29|EX-Z33|EX-Z35|EX-Z37|EX-Z42|EX-Z270|EX-Z280|"
     "EX-Z330|EX-Z350|EX-Z370|EX-Z450|EX-Z550|EX-Z2000|EX-Z2300|"
     "EX-Z3000|EX-ZS5|EX-ZS6|EX-ZS10|EX-ZS12|EX-ZS15|EX-ZS20|"
     "EX-ZS30|EX-ZS100|EX-ZS150|EX-ZS190|EX-ZS200|EX-N1|EX-N5|"
     "EX-N10|EX-N20|EX-N50|EX-H5|EX-H10|EX-H15|EX-H20G|EX-H30|"
     "EX-H35|EX-H50|EX-H60|EX-FH20|EX-FH25|EX-FH100|EX-FC100|"
     "EX-FC150|EX-FC200S|EX-FC300S|EX-TR100|EX-TR150|EX-ZR10|"
     "EX-ZR15|EX-ZR20|EX-ZR100|EX-ZR200|EX-ZR300|EX-ZR400|"
     "EX-ZR700|EX-ZR800|EX-ZR1000|EX-ZR1100|EX-ZR1200|EX-ZR1500|"
     "EX-ZR3500|EX-ZR5000|EX-10|EX-100|EX-F1"),
    # ---------------------------------------------------------- Pentax
    ("Pentax", "1/2.7", "Optio 230|Optio 330|Optio 330GS|Optio 430|"
     "Optio 30|Optio 33L|Optio 33LF|Optio 33WR|Optio 43WR|Optio S|"
     "Optio S30|Optio S40|Optio S45|Optio S50|Optio S55|Optio E10"),
    ("Pentax", "1/2.5", "Optio 50|Optio 50L|Optio 60|Optio A10|"
     "Optio A20|Optio A30|Optio A40|Optio E20|Optio E25|Optio E30|"
     "Optio E40|Optio E50|Optio E60|Optio L30|Optio L40|Optio M10|"
     "Optio M20|Optio M30|Optio M40|Optio M50|Optio M60|Optio S4|"
     "Optio S4i|Optio S5i|Optio S5n|Optio S5z|Optio S6|Optio S7|"
     "Optio S10|Optio S12|Optio SV|Optio SVi|Optio T10|Optio T20|"
     "Optio T30|Optio V10|Optio W10|Optio W20|Optio W30|Optio W60|"
     "Optio Z10|Optio 750Z|Optio X"),
    ("Pentax", "1/2.3", "Optio E70|Optio E75|Optio E80|Optio E85|"
     "Optio E90|Optio H90|Optio I-10|Optio L50|Optio LS1000|"
     "Optio LS1100|Optio LS465|Optio M85|Optio M90|Optio P70|"
     "Optio P80|Optio RS1000|Optio RS1500|Optio RZ10|Optio RZ18|"
     "Optio S1|Optio T35|Optio V20|Optio VS20|Optio W80|Optio W90|"
     "Optio WG-1|Optio WG-2|Optio WG-10|WG-3|WG-4|WG-10|WG-30|"
     "WG-50|X70|X90|X-5|XG-1|Optio WS80|Optio WPi|Optio WP"),
    ("Pentax", "aps-c", "*ist D|*ist DL|*ist DL2|*ist DS|*ist DS2|"
     "K10D|K20D|K100D|K100D Super|K110D|K200D|K-01|K-3|K-3 II|"
     "K-3 Mark III|K-5|K-5 II|K-5 II s|K-7|K-30|K-50|K-70|K-500|"
     "K-m|K-r|K-x|K-S1|K-S2|KP"),
    ("Pentax", "ff", "K-1|K-1 Mark II|645D|645Z"),
    ("Pentax", "1/1.7", "Q7|Q-S1|MX-1"),
    ("Pentax", "1/2.3", "Q|Q10"),
    # --------------------------------------------------------- Samsung
    ("Samsung", "1/2.7", "Digimax 101|Digimax 130|Digimax 200|"
     "Digimax 201|Digimax 202|Digimax 230|Digimax 240|Digimax 250|"
     "Digimax 301|Digimax 330|Digimax 340|Digimax 350SE|"
     "Digimax 360|Digimax 370|Digimax 401|Digimax 420|Digimax 430|"
     "Digimax A40|Digimax A400|Digimax A402|Digimax A5|Digimax A50|"
     "Digimax A502|Digimax A503|Digimax A55W|Digimax A6|Digimax A7|"
     "Digimax U-CA 3|Digimax U-CA 4|Digimax U-CA 401|"
     "Digimax U-CA 501|Digimax U-CA 505|Digimax V3|Digimax V4|"
     "Digimax V40|Digimax V50|Digimax V5|Digimax V6|Digimax V70|"
     "Digimax V700|Digimax V800|Digimax S500|Digimax S600|"
     "Digimax S800|Digimax D53|Digimax D73"),
    ("Samsung", "1/2.5", "S630|S730|S750|S760|S850|S1030|S1050|"
     "S1060|D60|D70|D75|D85|L60|L73|L74 Wide|L77|L80|L83T|L85|"
     "L100|L110|L200|L210|L310W|L700|L730|L830|M100|M110|NV3|NV4|"
     "NV7 OPS|i7|i70|i8|i80|i85|i100|P800|P1000|PL10|PL50|PL51|"
     "PL55|PL60|PL65|PL70|PL80|GX-1L|GX-1S"),
    ("Samsung", "1/2.3", "ES10|ES15|ES17|ES19|ES20|ES25|ES28|ES30|"
     "ES55|ES60|ES65|ES70|ES71|ES73|ES74|ES75|ES80|ES90|ES95|"
     "PL20|PL21|PL90|PL100|PL101|PL120|PL121|PL150|PL151|PL170|"
     "PL171|PL200|PL201|PL210|PL211|PL220|PL221|ST30|ST45|ST50|"
     "ST60|ST61|ST65|ST66|ST70|ST71|ST72|ST76|ST77|ST88|ST90|"
     "ST93|ST95|ST96|ST150F|ST200F|ST700|ST1000|SL30|SL35|SL40|"
     "SL50|SL102|SL201|SL202|SL203|SL30|SL310W|SL420|SL502|SL600|"
     "SL605|SL620|SL630|SL720|SL820|WB30F|WB31F|WB35F|WB50F|"
     "WB100|WB101|WB110|WB150F|WB151F|WB200F|WB210|WB250F|WB280F|"
     "WB350F|WB500|WB510|WB550|WB560|WB600|WB610|WB650|WB660|"
     "WB690|WB700|WB750|WB800F|WB850F|WB1100F|WB2100|HZ10W|HZ15W|"
     "HZ25W|HZ30W|HZ35W|HZ50W|TL90|TL100|TL105|TL110|TL205|TL210|"
     "TL220|TL225|TL240|TL350|DV100|DV150F|DV300F|MV800|"
     "GALAXY Camera|EK-GC100|EK-GC110|EK-GC200"),
    ("Samsung", "1/1.8", "Digimax V10|Pro815"),
    ("Samsung", "1/1.7", "TL500|EX1|EX2F"),
    ("Samsung", "1/2.33", "WB5000|WB5500"),
    ("Samsung", "aps-c-sony", "NX5|NX10|NX11|NX20|NX30|NX100|NX200|"
     "NX210|NX300|NX300M|NX500|NX1000|NX1100|NX2000|NX3000|"
     "NX mini|NX1|GX10|GX20"),
    # ----------------------------------------------------------- Ricoh
    ("Ricoh", "1/2.7", "Caplio G3|Caplio G4|Caplio G4 wide|"
     "Caplio RR30|Caplio RR10|Caplio RR120|Caplio RX|Caplio R1|"
     "Caplio R1V|Caplio R2|Caplio RZ1"),
    ("Ricoh", "1/2.5", "Caplio R3|Caplio R4|Caplio R5|Caplio R30|"
     "Caplio R40|Caplio RR630|Caplio RR660|Caplio RR750|"
     "Caplio RR770"),
    ("Ricoh", "1/2.3", "R8|R10|CX1|CX2|CX3|CX4|CX5|CX6|PX|G700|"
     "G800|WG-4|WG-5 GPS|WG-6|WG-20|WG-30|WG-30W|WG-40|WG-50|"
     "WG-60|WG-70|HZ15|Caplio R6|Caplio R7"),
    ("Ricoh", "1/1.8", "Caplio GX|Caplio GX8|GR DIGITAL|"
     "GR DIGITAL 2|Caplio GX100"),
    ("Ricoh", "1/1.7", "GR DIGITAL 3|GR DIGITAL 4|GX200|GXR P10"),
    ("Ricoh", "aps-c", "GR|GR II|GR III|GR IIIx|GXR MOUNT A12"),
    # --------------------------------------------- Minolta / K-Minolta
    ("Minolta", "1/2.7", "DiMAGE E201|DiMAGE E203|DiMAGE E223|"
     "DiMAGE E323|DiMAGE X|DiMAGE Xi|DiMAGE Xt|DiMAGE X20|"
     "DiMAGE X21|DiMAGE X31|DiMAGE X50|DiMAGE S304|DiMAGE S404|"
     "DiMAGE S414|DiMAGE 2300|DiMAGE 2330 ZOOM"),
    ("Minolta", "1/1.8", "DiMAGE F100|DiMAGE F200|DiMAGE F300|"
     "DiMAGE 5|DiMAGE 7|DiMAGE 7i|DiMAGE 7Hi|DiMAGE A1|DiMAGE A2|"
     "DiMAGE A200|DiMAGE G400|DiMAGE G500|DiMAGE G530|DiMAGE G600"),
    ("Konica Minolta", "1/2.5", "DiMAGE X g|DiMAGE X S4|DiMAGE X60|"
     "DiMAGE X1|DiMAGE Z1|DiMAGE Z2|DiMAGE Z3|DiMAGE Z5|DiMAGE Z6|"
     "DiMAGE Z10|DiMAGE Z20|DiMAGE E40|DiMAGE E50"),
    ("Konica Minolta", "aps-c", "Maxxum 7D|Maxxum 5D|DYNAX 7D|"
     "DYNAX 5D|ALPHA-7 DIGITAL|ALPHA SWEET DIGITAL"),
    # -------------------------------------------------------------- HP
    ("HP", "1/2.7", "PhotoSmart 318|PhotoSmart 435|PhotoSmart 612|"
     "PhotoSmart 620|PhotoSmart 635|PhotoSmart 715|PhotoSmart 720|"
     "PhotoSmart 735|PhotoSmart 812|PhotoSmart 850|PhotoSmart 935|"
     "PhotoSmart 945|PhotoSmart C200|PhotoSmart C500|"
     "PhotoSmart M22|PhotoSmart M23|PhotoSmart M307|PhotoSmart M407|"
     "PhotoSmart M417|PhotoSmart M425|PhotoSmart M437|"
     "PhotoSmart M447|PhotoSmart M517|PhotoSmart M525|"
     "PhotoSmart M527|PhotoSmart M537|PhotoSmart M547|"
     "PhotoSmart M627|PhotoSmart M637|PhotoSmart M737"),
    ("HP", "1/2.5", "PhotoSmart R507|PhotoSmart R607|PhotoSmart R707|"
     "PhotoSmart R717|PhotoSmart R725|PhotoSmart R727|"
     "PhotoSmart R742|PhotoSmart R817|PhotoSmart R818|"
     "PhotoSmart R827|PhotoSmart R837|PhotoSmart R847|"
     "PhotoSmart R927|PhotoSmart R937|PhotoSmart R967|"
     "PhotoSmart E317|PhotoSmart E327|PhotoSmart E337|"
     "PhotoSmart E427"),
    # ----------------------------------------------------------- Leica
    ("Leica", "1/2.5", "C-LUX 1|C-LUX 2|C-LUX 3"),
    ("Leica", "1/2.33", "V-LUX 20|V-LUX 30|V-LUX 40"),
    ("Leica", "1/1.65", "D-LUX 2|D-LUX 3"),
    ("Leica", "1/1.63", "D-LUX 4|D-LUX 5"),
    ("Leica", "1/1.7", "D-LUX 6"),
    ("Leica", "4/3", "D-LUX 7|DIGILUX 3|D-Lux (Typ 109)"),
    ("Leica", "2/3", "DIGILUX 1|DIGILUX 2"),
    ("Leica", "1", "V-LUX (Typ 114)|C-Lux"),
    ("Leica", "aps-c", "X1|X2|X (Typ 113)|X-U (Typ 113)|T (Typ 701)|"
     "TL|TL2|CL"),
    ("Leica", "ff", "M8|M9|M (Typ 240)|M10|M11|Q (Typ 116)|Q2|Q3|"
     "SL (Typ 601)|SL2|SL2-S"),
    # ----------------------------------------------------------- Sigma
    ("Sigma", "foveon", "SD9|SD10|SD14|SD15|SD1|SD1 Merrill|DP1|"
     "DP1S|DP1X|DP2|DP2S|DP2X|DP1 Merrill|DP2 Merrill|DP3 Merrill|"
     "dp0 Quattro|dp1 Quattro|dp2 Quattro|dp3 Quattro|sd Quattro"),
    ("Sigma", "ff", "fp|fp L"),
    # ----------------------------------------------------------- Sanyo
    ("Sanyo", "1/2.7", "VPC-S1|VPC-S3|VPC-S4|VPC-S5|VPC-E6|VPC-R1|"
     "VPC-AZ3|Xacti VPC-C4|Xacti VPC-C5|Xacti VPC-C6|"
     "Xacti VPC-S60|Xacti VPC-S70|Xacti VPC-603|Xacti VPC-J4"),
    ("Sanyo", "1/2.5", "Xacti VPC-E60|Xacti VPC-E760|Xacti VPC-E870|"
     "Xacti VPC-E890|Xacti VPC-S500|Xacti VPC-S600|Xacti VPC-S650|"
     "Xacti VPC-S670|Xacti VPC-S750|Xacti VPC-S760|Xacti VPC-S770|"
     "Xacti VPC-S870|Xacti VPC-S880|Xacti VPC-W800|Xacti VPC-T700|"
     "Xacti VPC-T850|Xacti VPC-HD1|Xacti VPC-HD2"),
    ("Sanyo", "1/2.3", "Xacti VPC-X1200|Xacti VPC-X1400|"
     "Xacti VPC-S1070|Xacti VPC-S1080|Xacti VPC-S1275|"
     "Xacti VPC-S1414|Xacti VPC-E1500TP"),
    # --------------------------------------------------------- Toshiba
    ("Toshiba", "1/2.7", "PDR-M25|PDR-M60|PDR-M61|PDR-M65|PDR-M70|"
     "PDR-M71|PDR-M81|PDR-3310|PDR-T10|PDR-T20|PDR-T30"),
    # ----------------------------------------------------------- BenQ
    ("BenQ", "1/2.5", "DC C35|DC C40|DC C50|DC C51|DC C60|DC C62|"
     "DC C420|DC C500|DC C510|DC C520|DC C530|DC C540|DC C610|"
     "DC C630|DC C640|DC C740|DC C750|DC C800|DC C840|DC C1000|"
     "DC E30|DC E40|DC E41|DC E43|DC E53|DC E300|DC E310|DC E510|"
     "DC E520|DC E600|DC E610|DC E720"),
    ("BenQ", "1/2.3", "DC E1020|DC E1050|DC E1230|DC E1250|"
     "DC E1280|DC E1460|DC E1465|DC GH600|DC GH700|DC LH500|"
     "DC LM100|DC S1410|DC S1430|DC W1220|DC X600|DC X710|DC X720|"
     "DC X725|DC X735|DC X800|DC X835|AE100|AE110|AE200|AE210|"
     "AE220|AC100|LT100"),
    # --------------------------------------------------------- Vivitar
    ("Vivitar", "1/2.5", "ViviCam 3610|ViviCam 3615|ViviCam 3705|"
     "ViviCam 3715|ViviCam 3746|ViviCam 3750|ViviCam 3785|"
     "ViviCam 3815|ViviCam 3825|ViviCam 3915|ViviCam 3935|"
     "ViviCam 4000|ViviCam 4090|ViviCam 4345|ViviCam 4386|"
     "ViviCam 5015|ViviCam 5105|ViviCam 5155|ViviCam 5195|"
     "ViviCam 5355|ViviCam 5385|ViviCam 5386|ViviCam 5399|"
     "ViviCam 6150|ViviCam 6200|ViviCam 6300|ViviCam 6320|"
     "ViviCam 7100|ViviCam 7310|ViviCam 7388|ViviCam 7500|"
     "ViviCam 8300|ViviCam 8400|ViviCam 8600|ViviCam X30"),
    # -------------------------------------------------------------- GE
    ("GE", "1/2.5", "A730|A735|A830|A835|E840S|E850|E1030|E1035|"
     "E1040|E1050TW|E1235|E1240|E1250TW|G1|G2|G3WP"),
    ("GE", "1/2.3", "A950|A1030|A1035|A1050|A1235|A1250|A1255|"
     "A1456W|C1033|C1233|C1433|E1255W|E1276W|E1480W|E1486TW|"
     "J1050|J1250|J1455|J1456W|X400|X500|X550|X600|PJ1"),
    # -------------------------------------------------------- Polaroid
    ("Polaroid", "1/2.5", "i532|i533|i633|i634|i733|i734|i735|i832|"
     "i833|i834|i835|i1036|a500|a520|a530|a550|t730|t831|t1031"),
    ("Polaroid", "1/2.3", "t1035|t1232|t1234|t1455|is2132|is326|"
     "iX828|iE826|iS048"),
    # -------------------------------------------------------- Praktica
    ("Praktica", "1/2.5", "DCZ 5.1|DCZ 5.2|DCZ 5.3|DCZ 5.8|DCZ 6.3|"
     "DCZ 6.8|DCZ 7.1|DCZ 7.2|DCZ 7.3|DCZ 8.1|DCZ 10.1|DCZ 10.2|"
     "DCZ 10.3|DCZ 10.4|Luxmedia 5008|Luxmedia 6105|Luxmedia 6203|"
     "Luxmedia 7105|Luxmedia 7203|Luxmedia 8213|Luxmedia 8403|"
     "Luxmedia 10-03|Luxmedia 10-23|Luxmedia 12-03|Luxmedia 12-23"),
    ("Praktica", "1/2.3", "Luxmedia 14-04|Luxmedia 14-Z50S|"
     "Luxmedia 16-Z12S|Luxmedia 16-Z21S|Luxmedia 16-Z24S|"
     "Luxmedia 16-Z52|Luxmedia 18-Z36C|Luxmedia WP240"),
    # ---------------------------------------------------------- Rollei
    ("Rollei", "1/2.5", "Compactline 50|Compactline 52|"
     "Compactline 55|Compactline 80|Compactline 90|"
     "Compactline 101|Compactline 110|Compactline 130|dp300|"
     "Prego dp4200|Prego dp5200|Prego dp5300|Prego dp6000|"
     "RCP-7430XW|RCP-8427XW|RCP-S10|X-8|XS-8|XS-10 inTouch"),
    # ---------------------------------------------------- Kyocera etc.
    ("Kyocera", "1/2.7", "Finecam S3|Finecam S4|Finecam S5|"
     "Finecam L3v|Finecam L4v|Finecam M400R|Finecam M410R|"
     "Finecam SL300R|Finecam SL400R"),
    ("Contax", "1/1.8", "TVS DIGITAL|U4R|i4R|SL300R T*"),
    ("Epson", "1/1.8", "PhotoPC L-300|PhotoPC L-400|PhotoPC L-410|"
     "PhotoPC L-500V|R-D1|R-D1s"),
    ("JVC", "1/2.7", "GC-QX3HD|GC-QX5HD|GC-S5|GC-X3"),
    # ----------------------------------------------------- phones etc.
    ("Apple", "1/3.2", "iPhone 3G|iPhone 3GS|iPhone 4|iPhone 4S|"
     "iPod touch"),
    ("Apple", "1/3", "iPhone 5|iPhone 5c|iPhone 5s|iPhone 6|"
     "iPhone 6 Plus|iPhone SE"),
    ("Apple", "1/2.9", "iPhone 6s|iPhone 6s Plus|iPhone 7|"
     "iPhone 7 Plus|iPhone 8|iPhone 8 Plus|iPhone X"),
    ("Apple", "1/2.5", "iPhone XS|iPhone XS Max|iPhone XR|"
     "iPhone 11|iPhone 11 Pro|iPhone 11 Pro Max|iPhone SE (2nd "
     "generation)|iPhone 12 mini|iPhone 12"),
    ("Apple", "1/1.9", "iPhone 12 Pro|iPhone 12 Pro Max|iPhone 13|"
     "iPhone 13 mini|iPhone 13 Pro|iPhone 13 Pro Max|iPhone 14|"
     "iPhone 14 Plus"),
    ("Samsung", "1/3.2", "GT-I9100|GT-I9300|SGH-T999|SCH-I535"),
    ("Samsung", "1/3", "GT-I9500|GT-I9505|SM-G900F|SM-G900V|"
     "SM-N9005|SM-N900"),
    ("Samsung", "1/2.6", "SM-G920F|SM-G925F|SM-G930F|SM-G935F|"
     "SM-G950F|SM-G955F|SM-G960F|SM-G965F|SM-N950F|SM-N960F"),
    ("Samsung", "1/2.55", "SM-G973F|SM-G975F|SM-G980F|SM-G985F|"
     "SM-N970F|SM-N975F"),
    ("Google", "1/3.2", "Nexus S|Galaxy Nexus"),
    ("Google", "1/3", "Nexus 4|Nexus 5|Nexus 6"),
    ("LGE", "1/3", "Nexus 5X|LG-D855|LG-H815|LG-H850|LG-H870"),
    ("Google", "1/2.6", "Pixel|Pixel XL"),
    ("Google", "1/2.55", "Pixel 2|Pixel 2 XL|Pixel 3|Pixel 3 XL|"
     "Pixel 3a|Pixel 3a XL|Pixel 4|Pixel 4 XL|Pixel 4a|Pixel 5|"
     "Pixel 5a"),
    ("HTC", "1/3", "One|One M8|One M9|One X|Desire HD|10|U11|"
     "Sensation|EVO 4G|Desire 601|Desire 610|Desire 816"),
    ("Nokia", "1/3.2", "Lumia 520|Lumia 521|Lumia 610|Lumia 620|"
     "Lumia 630|Lumia 635|Lumia 710|Lumia 800|Lumia 820|Lumia 900|"
     "N8-00|N86 8MP|N95|N96|N97|E7-00|C7-00|5800 XpressMusic|6220c"),
    ("Nokia", "1/3", "Lumia 920|Lumia 925|Lumia 928|Lumia 930|"
     "Lumia 1320|Lumia 625|Lumia 730|Lumia 735|Lumia 830"),
    ("Nokia", "1/1.5", "Lumia 1020|808 PureView"),
    ("Nokia", "1/2.5", "Lumia 1520|Lumia 950|Lumia 950 XL"),
    ("Motorola", "1/3", "Moto G|Moto G (2nd Gen)|Moto G (3rd Gen)|"
     "Moto X|Moto X (2nd Gen)|Droid RAZR|Droid Turbo|Moto E|"
     "Moto Z|Moto G4|Moto G5|Moto G5 Plus|Moto G6|Moto G7"),
    ("Sony Ericsson", "1/2.5", "K750i|K790i|K800i|K810i|C702|C902|"
     "C905|W810i|W890i|W995|Satio"),
    ("Sony", "1/3", "C6603|C6903|D5803|D6603|E6653|F5121|G8141|"
     "H8216|Xperia Z|Xperia Z1|Xperia Z2|Xperia Z3|Xperia Z5|"
     "Xperia XZ|Xperia XZ1|Xperia XZ2|Xperia 1|Xperia 5"),
    ("OnePlus", "1/2.6", "ONE A2003|ONEPLUS A3003|ONEPLUS A5000|"
     "ONEPLUS A6003|ONEPLUS A6013|GM1913|HD1913|IN2023|KB2005"),
    ("Huawei", "1/2.6", "EVA-L09|VTR-L09|CLT-L09|CLT-L29|ELE-L29|"
     "VOG-L29|ANE-LX1|P20|P20 Pro|P30|P30 Pro|Mate 10|Mate 20 Pro|"
     "Nexus 6P|honor 8|honor 10"),
    ("Xiaomi", "1/2.6", "Mi 5|Mi 6|Mi 8|Mi 9|Mi A1|Mi A2|"
     "Redmi Note 4|Redmi Note 5|Redmi Note 7|Redmi Note 8 Pro|"
     "POCOPHONE F1|Mi MIX 2|Mi MIX 3"),
    # ------------------------------------------------- action / drones
    ("GoPro", "1/2.3", "HERO|HERO2|HERO3 Black Edition|"
     "HERO3 Silver Edition|HERO3 White Edition|HERO3+ Black Edition|"
     "HERO3+ Silver Edition|HERO4 Black|HERO4 Silver|HERO4 Session|"
     "HERO5 Black|HERO5 Session|HERO6 Black|HERO7 Black|"
     "HERO7 Silver|HERO7 White|HERO8 Black|HERO9 Black|HERO10 Black"),
    ("DJI", "1/2.3", "FC300X|FC300S|FC330|FC220|FC200|FC350|"
     "Phantom Vision FC200|FC550|Mavic Air|Spark"),
    ("DJI", "1", "FC6310|FC6310S|L1D-20c|Mavic 2 Pro"),
    ("Parrot", "1/2.3", "ANAFI|Bebop 2|Sequoia"),
    ("Garmin", "1/2.3", "VIRB|VIRB Elite|VIRB Ultra 30|VIRB XE"),
    ("YI", "1/2.3", "YI 4K|YI 4K+|M1 action"),
    ("SJCAM", "1/2.3", "SJ4000|SJ5000|SJ5000X|SJ6 LEGEND|SJ7 STAR"),
    # ------------------------------------------------- misc / OEM
    ("Aiptek", "1/2.5", "PocketCam 8900|PENCAM 1.3M|PocketDV 5700"),
    ("Agfa", "1/2.7", "ePhoto CL18|ePhoto CL30|ePhoto 1280|"
     "ePhoto 1680"),
    ("AgfaPhoto", "1/2.5", "DC-530i|DC-630|DC-630i|DC-730i|DC-735|"
     "DC-735i|DC-830|DC-830i|DC-833m|sensor 500-X|sensor 505-D|"
     "sensor 530s|Compact 100|Compact 102|Compact 103|OPTIMA 100|"
     "OPTIMA 102|OPTIMA 103|OPTIMA 104|OPTIMA 105|OPTIMA 1338mT|"
     "OPTIMA 1438m|OPTIMA 8328m|selecta 14|selecta 16|selecta-S"),
    ("Acer", "1/2.5", "CE-5330|CE-5430|CE-6430|CL-5300|CS-5530|"
     "CS-5531|CS-6530|CS-6531|CU-6530"),
    ("Acer", "1/1.8", "CI-6330|CI-6530|CI-8330|CP-8531|CP-8660|"
     "CR-5130|CR-6530|CR-8530"),
    ("Trust", "1/2.5", "740 LCD POWERC@M ZOOM|910Z POWERC@M|"
     "DC-4200|DC-5200|DC-7200"),
    ("Medion", "1/2.5", "MD 85416|MD 85562|MD 85700|MD 85863|"
     "MD 86063|MD 86288|Life P42012|Life P43028|Life P44029|"
     "Life S42008|Life S47000"),
    ("Traveler", "1/2.5", "DC-5300|DC-6300|DC-8300|DC-8500|DC-X5|"
     "DC-XZ6|Super Slimx SW8|Super Slimx XS8|Super Slimx XS70"),
    ("Genius", "1/2.5", "G-Shot D211|G-Shot D5123|G-Shot P510|"
     "G-Shot P7545"),
    ("Insta360", "1/2.3", "ONE|ONE X|ONE X2|GO 2"),
    ("Nintendo", "1/4", "3DS"),
    ("Canon", "1/3.2", "PowerShot E3|IXY DIGITAL 10"),
    ("Phase One", "mf", "P25|P30|P45|P65+|IQ140|IQ160|IQ180|"
     "IQ250|IQ260|IQ280|IQ3 100MP|XF IQ4 150MP"),
    ("Hasselblad", "mf", "H3DII-39|H4D-40|H4D-50|H4D-60|H5D-40|"
     "H5D-50c|H6D-100c|X1D-50c|X1D II 50C|CFV-50c|907X 50C"),
    ("Leaf", "mf", "Aptus 22|Aptus 65|Aptus 75|Aptus-II 5|"
     "Aptus-II 8|Aptus-II 10|Credo 40|Credo 60|Credo 80"),
    ("Mamiya", "mf", "ZD|DM22|DM28|DM33|DM40|DM56"),
    # --------------------------------------------- long-tail families
    # Olympus C-series (early 1/2-2/3" CCD compacts) + AZ/mju gaps
    ("Olympus", "1/2.7", "C-1|C-1 Zoom|C-100|C-120|C-150|C-160|"
     "C-170|C-180|C-120 D-380|C-150 D-390|AZ-1|AZ-1 Ferrari 2004|"
     "AZ-2 Zoom|C-350 Zoom|C-360 Zoom|C-310 Zoom|C-315 Zoom|"
     "C-25|C-2 Zoom"),
    ("Olympus", "1/3.2", "C-300 Zoom|C-220 Zoom|C-ism 01|"
     "C-990 Zoom|C-960 Zoom"),
    ("Olympus", "1/2.5", "C-480 Zoom|C-500 Zoom|C-520 Zoom|"
     "C-540 Zoom|C-550 Zoom|C-560 Zoom|C-570 Zoom|"
     "SP 700|mju 600|mju 700|mju 710|mju 725 SW|mju 720 SW|"
     "mju 730|mju 750|mju 760|mju 780|mju 790 SW|mju 800|"
     "mju 810|mju 820|mju 830|mju 840|mju 850 SW"),
    ("Olympus", "1/2.33", "SP 800 UZ|SP 600 UZ|SP 590 UZ|"
     "SP 565 UZ|SP 560 UZ|SP 570 UZ|SP 550 UZ|mju 1040|mju 1050 SW|"
     "mju 1060|mju 1200|mju 5000|mju 550 WP|mju 850|mju 9000|"
     "mju 9010|mju 7050|mju 7040|mju 7030|mju 7020|mju 7010|"
     "mju 7000|mju 6020|mju 6010|mju 6000|mju TOUGH-3000|"
     "mju TOUGH-6010|mju TOUGH-6020|mju TOUGH-8010"),
    ("Olympus", "1/2", "C-1000L|C-1400L|C-1400XL|C-820L|C-840L|"
     "C-900 Zoom|C-920 Zoom|C-980 Zoom|D-200L|D-300L|D-320L|"
     "D-340L|D-340R|D-360L|D-400 Zoom|D-450 Zoom|D-460 Zoom|"
     "D-500L|D-600L|D-620L"),
    ("Olympus", "1/1.8", "C-1040 XR|C-2000 Zoom|C-2020 Zoom|"
     "C-2040 Zoom|C-2100 UZ|C-3000 Zoom|C-3020 Zoom|C-3030 Zoom|"
     "C-3040 Zoom|C-4000 Zoom|C-4040 Zoom|C-4100 Zoom|C-50 Zoom|"
     "C-5050 Zoom|C-5060 Wide Zoom|C-60 Zoom|C-70 Zoom|"
     "C-700 UZ|C-730 UZ|C-740 UZ|C-750 UZ|C-755 UZ|C-765 UZ|"
     "C-770 UZ|C-7000 Zoom|C-7070 Wide Zoom|C-8080 Wide Zoom|"
     "C-200 Zoom|C-211 Zoom|C-21|C-2500L|C-3100 Zoom|C-40 Zoom|"
     "C-5000 Zoom|C-55 Zoom|C-5500 Zoom|C-720 UZ"),
    # Fujifilm early FinePix numerics + odds
    ("Fujifilm", "1/2.7", "FinePix 1400z|FinePix 2300|"
     "FinePix 2400 Zoom|FinePix 2600 Zoom|FinePix 2650|"
     "FinePix 2800 Zoom|FinePix 30i|FinePix A101|FinePix A120|"
     "FinePix A200|FinePix A201|FinePix A202|FinePix A204|"
     "FinePix A205 Zoom|FinePix A210 Zoom|FinePix A230|"
     "FinePix 1300|FinePix 1500|FinePix 2200|Digital Q1|A850"),
    ("Fujifilm", "1/1.7", "FinePix 4700 Zoom|FinePix 4800 Zoom|"
     "FinePix 4900 Zoom|FinePix 6800 Zoom|FinePix 6900 Zoom|"
     "FinePix 40i|FinePix 50i|FinePix F601|FinePix F601 Zoom|"
     "FinePix S602 Zoom|FinePix F700|FinePix F710|FinePix F810|"
     "FinePix F610|FinePix E550|FinePix S20 Pro|FinePix S7000"),
    ("Fujifilm", "1/2", "FinePix 1700z|FinePix 4500|FinePix 4700z|"
     "MX-1200|MX-1700|MX-2700|MX-2900 Zoom|DS-260HD|DS-300|"
     "Bigjob HD-3W|Bigjob HD1"),
    ("Fujifilm", "1/2.5", "FinePix A310 Zoom|FinePix A330|"
     "FinePix A340|FinePix A345|FinePix A350|FinePix A400|"
     "FinePix A500|FinePix A600|FinePix F401 Zoom|FinePix F402|"
     "FinePix F410 Zoom|FinePix F420 Zoom|FinePix F440 Zoom|"
     "FinePix F450 Zoom|FinePix F460|FinePix F470|FinePix F480|"
     "FinePix M603|FinePix S304|FinePix S3000 Zoom|"
     "FinePix S3100 Zoom|FinePix S3500 Zoom|FinePix S5000 Zoom|"
     "FinePix S5100 Zoom|FinePix S5200|FinePix S5500 Zoom|"
     "FinePix S5600|FinePix Z1|FinePix Z2|FinePix Z3|FinePix Z5fd"),
    # Sony Alpha / NEX naming variants the EXIF tag actually emits
    ("Sony", "aps-c-sony", "NEX-7|Alpha a3000|Alpha a5000|"
     "Alpha a5100|Alpha a6000|A77 II|Alpha DSLR-A100|"
     "Alpha DSLR-A200|Alpha DSLR-A230|Alpha DSLR-A290|"
     "Alpha DSLR-A300|Alpha DSLR-A330|Alpha DSLR-A350|"
     "Alpha DSLR-A380|Alpha DSLR-A390|Alpha DSLR-A450|"
     "Alpha DSLR-A500|Alpha DSLR-A550|Alpha DSLR-A560|"
     "Alpha DSLR-A580|Alpha DSLR-A700|Alpha NEX-3|Alpha NEX-3N|"
     "Alpha NEX-5|Alpha NEX-5N|Alpha NEX-5R|Alpha NEX-5T|"
     "Alpha NEX-6|Alpha NEX-C3|Alpha NEX-F3|Alpha SLT-A33|"
     "Alpha SLT-A35|Alpha SLT-A37|Alpha SLT-A55|Alpha SLT-A57|"
     "Alpha SLT-A58|Alpha SLT-A65|Alpha SLT-A77"),
    ("Sony", "ff", "Alpha 7|Alpha 7R|Alpha 7S|Alpha 7 II|"
     "Alpha DSLR-A850|Alpha DSLR-A900|Alpha SLT-A99"),
    # Kodak DC/DX/CX early lines
    ("Kodak", "1/2", "DC200|DC200 plus|DC210 plus|DC215|DC220|"
     "DC240|DC260|DC265|DC280|DC290|DC3200|DC3400|DC4800|DC5000|"
     "DCS420|DCS460|DC120|DC25|DC40|DC50"),
    ("Kodak", "1/2.7", "CX4200|CX4210|CX4230|CX4300|CX4310|"
     "CX6200|CX6230|CX6330|CX6445|CX7220|CX7300|CX7310|CX7330|"
     "CX7430|CX7525|CX7530|DX3500|DX3600|DX3700|DX3900|DX4330|"
     "DX4530|DX4900|DX6340|DX6440|DX7440|DX7590|DX7630|C300|"
     "C310|C330|C340|C360|C433|C503|C530|C533|C603|C610|C643|"
     "C653|C663|C703|C743|C813|C875|C913|CD33|CD40|CD43|CD50"),
    # Nikon Coolpix numeric/compact gaps
    ("Nikon", "1/2.7", "Coolpix 2000|Coolpix 2100|Coolpix 2200|"
     "Coolpix 2500|Coolpix 3100|Coolpix 3200|Coolpix 3500|"
     "Coolpix 3700|Coolpix 4100|Coolpix 4200|Coolpix SQ|"
     "Coolpix 600|Coolpix 700|Coolpix 100|Coolpix 300|"
     "Coolpix L1|Coolpix L2|Coolpix L3|Coolpix L4|Coolpix L5|"
     "Coolpix L6|Coolpix L10|Coolpix L11|Coolpix L12|Coolpix L14"),
    ("Nikon", "1/1.8", "Coolpix 4300|Coolpix 4500|Coolpix 5000|"
     "Coolpix 5400|Coolpix 5700|Coolpix 8400|Coolpix 8700|"
     "Coolpix 8800|Coolpix 950|Coolpix 990|Coolpix 995|"
     "Coolpix P5000|Coolpix P5100|Coolpix 5200|Coolpix 5900|"
     "Coolpix 7600|Coolpix 7900|Coolpix P1|Coolpix P2|"
     "Coolpix P3|Coolpix P4"),
    # Samsung Digimax-era + CL/AQ/D compacts
    ("Samsung", "1/2.5", "AQ100|CL5|CL65|CL80|D830|D860|"
     "Digimax 210 SE|Digimax 220 SE|Digimax 35 MP3|Digimax 410|"
     "Digimax 50 duo|Digimax 530|Digimax A40|Digimax A50|"
     "Digimax A503|Digimax A55W|Digimax A6|Digimax A7|"
     "Digimax D53|Digimax D73|Digimax L50|Digimax L60|"
     "Digimax L70|Digimax L85|Digimax S500|Digimax S600|"
     "Digimax S700|Digimax S800|Digimax U-CA 3|Digimax U-CA 4|"
     "Digimax U-CA 401|Digimax U-CA 5|Digimax U-CA 501|"
     "Digimax V3|Digimax V4|Digimax V40|Digimax V5|Digimax V50|"
     "Digimax V6|Digimax V70|Digimax V700|Digimax i5|Digimax i50|"
     "Digimax i6"),
    # Sanyo Xacti / VPC compacts
    ("Sanyo", "1/2.33", "VPC S1275|VPC S1414|VPC X1200|"
     "VPC X1420|Xacti VPC-S120|Xacti VPC-S122|Xacti VPC-X1200"),
    ("Sanyo", "1/2.5", "VPC S1070|VPC S670|VPC S750|VPC S760|"
     "VPC S770|VPC S870|VPC S880|VPC E760|VPC E860|VPC E870|"
     "VPC E875|VPC E1075|Xacti VPC-S5|Xacti VPC-S6|Xacti VPC-S7|"
     "Xacti VPC-S60|Xacti VPC-S70|Xacti VPC-E6|Xacti VPC-E7|"
     "Xacti VPC-C5|Xacti VPC-C6|Xacti VPC-C40|Xacti VPC-CA6|"
     "Xacti VPC-CA9|Xacti VPC-CG6|Xacti VPC-CG9|Xacti VPC-CG10|"
     "Xacti VPC-HD1|Xacti VPC-HD2|Xacti VPC-HD700|Xacti VPC-J4|"
     "Xacti VPC-T700|Xacti VPC-T850|Xacti VPC-W800"),
    # Rollei compacts
    ("Rollei", "1/2.5", "Compactline 50|Compactline 52|"
     "Compactline 55|Compactline 80|Compactline 81|"
     "Compactline 101|Compactline 102|Compactline 103|"
     "Compactline 110|Compactline 150|Compactline 202|"
     "Compactline 203|Compactline 302|Compactline 304|"
     "Compactline 312|Compactline 350|Compactline 360 TS|"
     "Compactline 390 SE|Compactline 412|Compactline 415|"
     "Compactline 425|Flexline 100|Flexline 100 iT|Flexline 140|"
     "Flexline 200|Flexline 202|Flexline 250|Prego da3|"
     "Prego da4|Prego da5|Prego da6|Prego dp4200|Prego dp5200|"
     "Prego dp5300|Prego dp6000|Prego dp6200|Prego dp6300|"
     "Prego dp8300|dc3100|dcx310|dcx400|dk3000|dk4010|dp300|"
     "dr5|dr5100|ds6|dsx410|dt6|dt6 Tribute|dt8|da5324|da6324|"
     "da7325|da8324|da10-4|X-8|X-8 Sport|XS-8|XS-10 inTouch|"
     "Powerflex 360 Full HD|Powerflex 400|Powerflex 440|"
     "Powerflex 450|Powerflex 455|Powerflex 460|Powerflex 470|"
     "Powerflex 500|Powerflex 600|Powerflex 700|Powerflex 800|"
     "RCP-5324|RCP-6324|RCP-7324|RCP-7325|RCP-7330X|RCP-7430XW|"
     "RCP-8325|RCP-8325X|RCP-8325XS|RCP-8330X|RCP-8427XW|"
     "RCP-10628X|RCP-S8|RCP-S10"),
    # Praktica Luxmedia / DCZ
    ("Praktica", "1/2.5", "Luxmedia 4008|Luxmedia 5008|"
     "Luxmedia 5103|Luxmedia 5203|Luxmedia 5303|Luxmedia 6103|"
     "Luxmedia 6105|Luxmedia 6203|Luxmedia 6403|Luxmedia 6503|"
     "Luxmedia 7103|Luxmedia 7105|Luxmedia 7203|Luxmedia 7303|"
     "Luxmedia 7403|Luxmedia 8003|Luxmedia 8203|Luxmedia 8213|"
     "Luxmedia 8303|Luxmedia 8403|Luxmedia 8503|Luxmedia 10-03|"
     "Luxmedia 10-23|Luxmedia 10-X3|Luxmedia 10 X3|"
     "Luxmedia 12-03|Luxmedia 12-23|Luxmedia 12-Z4|"
     "Luxmedia 12-Z4TS|Luxmedia 12-Z5|Luxmedia 14-Z50S|"
     "Luxmedia 14-Z51|Luxmedia 14-Z80S|Luxmedia 16-Z12S|"
     "Luxmedia 16-Z21C|Luxmedia 16-Z21S|Luxmedia 16-Z24S|"
     "Luxmedia 16-Z51|Luxmedia 18-Z36C|Luxmedia 20-Z35S|"
     "DCZ 2.2|DCZ 3.0|DCZ 3.2|DCZ 3.3|DCZ 3.4|DCZ 3.5|DCZ 4.1|"
     "DCZ 4.2|DCZ 4.3|DCZ 4.4|DCZ 5.1|DCZ 5.2|DCZ 5.3|DCZ 5.4|"
     "DCZ 5.5|DCZ 6.2|DCZ 6.3|DCZ 6.8|DCZ 7.2|DCZ 7.3|DCZ 8.1|"
     "DCZ 8.2|DCZ 8.3|DC 32|DC 34|DC 42|DC 44|DC 50|DC 52|DC 60|"
     "DC 440|DC 500|DC 520|DC 530|DC 600|DC 660|DPix 1000|"
     "DPix 3000|DPix 3200|DPix 3300|DPix 5000 WP|DPix 510Z|"
     "DPix 530Z|Dpix 1100|Dpix 9000|Exakta DC 4200"),
    # BenQ DC line
    ("BenQ", "1/2.5", "DC C35|DC C40|DC C50|DC C51|DC C500|"
     "DC C510|DC C520|DC C530|DC C540|DC C610|DC C630|DC C640|"
     "DC C740|DC C740i|DC C750|DC C800|DC C840|DC C850|DC C1000|"
     "DC C1020|DC C1030 Eco|DC C1035|DC C1050|DC C1060|DC C1230|"
     "DC C1250|DC C1255|DC C1420|DC C1430|DC C1450|DC C1460|"
     "DC E30|DC E40|DC E41|DC E43|DC E53|DC E300|DC E310|"
     "DC E510|DC E520|DC E600|DC E605|DC E610|DC E720|DC E800|"
     "DC E820|DC E1000|DC E1020|DC E1050|DC E1230|DC E1240|"
     "DC E1260|DC E1280|DC E1420|DC P500|DC P860|DC S30|DC S40|"
     "DC S1430|DC X600|DC X710|DC X720|DC X725|DC X735|DC X800|"
     "DC X835|G1|E1465|LM100|AC100|S1410|T1260"),
    # Concord Eye-Q
    ("Concord", "1/2.7", "Eye-Q 1000|Eye-Q 1300|Eye-Q 2000|"
     "Eye-Q 2040|Eye-Q 3040AF|Eye-Q 3103|Eye-Q 3340z|Eye-Q 3341z|"
     "Eye-Q 3343z|Eye-Q 4060AF|Eye-Q 4330z|Eye-Q 4342z|"
     "Eye-Q 4360z|Eye-Q 5062AF|Eye-Q 5330z|Eye-Q 5345z|Eye-Q Duo|"
     "Eye-Q Go 2000|Eye-Q Go LCD|Eye-Q Go Wireless|3045|4340z|"
     "5340z|6340z|DV2020"),
    # Jenoptik JD
    ("Jenoptik", "1/2.5", "JD 1.3 LCD|JD 1300 D|JD 2.1 FF|"
     "JD 2.1 xz3|JD 2100 AF|JD 2100 F|JD 2100 M|JD 2100 z3 S|"
     "JD 2300 z3|JD 3.1 exclusiv|JD 3.1 z3 MPEG 4|JD 3.3 AF|"
     "JD 3.3 xz3|JD 3.3x4 ie|JD 3300 z3|JD 3300 z3 S|JD 4.0 LCD|"
     "JD 4.1 xz3|JD 4.1 z3 MPEG 4|JD 4.1 zoom|JD 4100 z3|"
     "JD 4100 z3 S|JD 4100 zoom|JD 4360 z|JD 5.0 z3 MPEG 4|"
     "JD 5.2 z3|JD 5.2 zoom|JD 5200 z3|JD 6.0 z3 MPEG 4|"
     "JD 6.0 z3 exclusiv|JD 8.0 exclusiv|JD 8.0z3|JD 8.0z3 EasyShot|"
     "JD C 1.3 SD|JD C 2.1 LCD|JD C 3.1 LI|JD C 3.1 SL|JD C 3.1 z3|"
     "JD C 1300|JD C 2100|JDC 3.1 z3"),
    # Minox DC / Classic
    ("Minox", "1/2.5", "DC 1011|DC 1022|DC 1033|DC 1044|DC 1055|"
     "DC 1211|DC 1222|DC 1233|DC 1311|DC 1422|DC 2111|DC 2122|"
     "DC 2133|DC 3.1|DC 4.1|DC 4011|DC 4211|DC 5.1|DC 5011|"
     "DC 5211|DC 6011|DC 6033 WP|DC 6211|DC 6311|DC 7011|"
     "DC 7411|DC 8011|DC 8111|DC 8122|DC 9011 WP|DC 2.1|DC 3.3|"
     "DC 5222|DC 5511|DC 1600|DC 2033|Classic Camera 5.0|"
     "Classic Leica M3 2.1|Classic Leica M3 3MP|Classic Leica M3 4MP|"
     "DD1|DD1 Diamond|DD100|DD200|DM 1|Mobi DV|Rolleiflex MiniDigi|"
     "Digital Spy Camera"),
    # Yakumo Mega Image
    ("Yakumo", "1/2.5", "Mega Image 34|Mega Image 35|Mega Image 37|"
     "Mega Image 45|Mega Image 47|Mega Image 47 SL|Mega Image 47sx|"
     "Mega Image 55cx|Mega Image 57|Mega Image 57x|Mega Image 67x|"
     "Mega Image 81|Mega Image 84 D|Mega Image 85D|Mega Image 610x|"
     "Mega Image 611x|Mega Image 811x|Mega Image II|Mega Image III|"
     "Mega Image IV|Mega Image V|Mega Image VI|Mega Image VII|"
     "Mega Image XL|CamMaster SD 482"),
    # Toshiba PDR
    ("Toshiba", "1/2.7", "PDR M11|PDR M21|PDR M25|PDR M60|PDR M61|"
     "PDR M65|PDR M70|PDR M71|PDR M81|PDR T10|PDR T20|PDR T30|"
     "PDR 2300|PDR 3300|PDR 3310|PDR 3320|PDR 4300|PDR 5300|"
     "PDR M5|PDR M4|PDR M3|Camileo"),
    # AgfaPhoto / Agfa
    ("AgfaPhoto", "1/2.5", "DC-533|DC-600uw|DC-630|DC-630i|"
     "DC-730i|DC-735|DC-735i|DC-738i|DC-830|DC-830i|DC-833m|"
     "DC-1030i|DC-1033m|DC-1033x|DC-1338i|DC-1338sT|DC-2030m|"
     "Optima 1|Optima 100|Optima 102|Optima 103|Optima 104|"
     "Optima 105|Optima 1438m|Optima 3|Optima 830UW|Optima 8328m|"
     "Sensor 505-D|Sensor 505-X|Sensor 530s|Sensor 830s|"
     "Selecta 16|ePhoto 1280|ePhoto 1680|ePhoto CL30|ePhoto CL50"),
    # Vivitar ViviCam
    ("Vivitar", "1/2.5", "ViviCam 3105s|ViviCam 3305|ViviCam 3315|"
     "ViviCam 3345|ViviCam 3350b|ViviCam 3555|ViviCam 3615|"
     "ViviCam 3625|ViviCam 3705|ViviCam 3715|ViviCam 3725|"
     "ViviCam 3730|ViviCam 3745|ViviCam 3765|ViviCam 3785|"
     "ViviCam 3805|ViviCam 3815|ViviCam 3825|ViviCam 3915|"
     "ViviCam 3935|ViviCam 4000|ViviCam 4090|ViviCam 4345|"
     "ViviCam 4355|ViviCam 4385|ViviCam 5105s|ViviCam 5150s|"
     "ViviCam 5160s|ViviCam 5195|ViviCam 5299|ViviCam 5350s|"
     "ViviCam 5385|ViviCam 5386|ViviCam 5388|ViviCam 6150s|"
     "ViviCam 6200w|ViviCam 6300|ViviCam 6320|ViviCam 6330|"
     "ViviCam 6380u|ViviCam 6385u|ViviCam 6388s|ViviCam 7310|"
     "ViviCam 7388s|ViviCam 7500i|ViviCam 8300s|ViviCam 8400|"
     "ViviCam 8600|ViviCam 8625|ViviCam X30|ViviCam X60"),
    # Leica compacts + M digitals
    ("Leica", "1/2.5", "C-Lux 1|C-Lux 2|C-Lux 3|D-Lux|D-Lux 2|"
     "D-Lux 3|Digilux|Digilux 4.3|Digilux Zoom"),
    ("Leica", "1/1.7", "D-Lux 4|D-Lux 5|D-Lux 6|Digilux 1"),
    ("Leica", "1/1.8", "Digilux 2|Digilux 3"),
    ("Leica", "2/3", "V-Lux 20|V-Lux 30|V-Lux 40"),
    ("Leica", "1", "V-Lux 1|V-Lux 2|V-Lux 3|V-Lux 4"),
    ("Leica", "aps-h", "M8|M8.2"),
    ("Leica", "ff", "M9|M9-P|M Monochrom|M Typ 240|SL Typ 601|Q|"
     "Q2|M10"),
    ("Leica", "aps-c", "X1|X2|X Vario|T Typ 701|CL|TL|TL2"),
    # Ricoh Caplio + GX/GR gaps
    ("Ricoh", "1/2.5", "Caplio G3|Caplio G4|Caplio G4 wide|"
     "Caplio GX|Caplio GX8|Caplio R1|Caplio R1V|Caplio R2|"
     "Caplio R3|Caplio R4|Caplio R5|Caplio R6|Caplio R7|"
     "Caplio R30|Caplio R40|Caplio RR30|Caplio RR120|"
     "Caplio RR211|Caplio RR230|Caplio RR330|Caplio RR530|"
     "Caplio RR630|Caplio RR660|Caplio RR750|Caplio RR770|"
     "Caplio RX|Caplio RZ1|Caplio 400G wide|Caplio 500G wide|"
     "Caplio 500SE"),
    # Konica KD + Q
    ("Konica", "1/1.8", "KD-310Z|KD-400Z|KD-410Z|KD-500Z|KD-510Z|"
     "Digital Revio KD-200Z|Digital Revio KD-210Z|"
     "Digital Revio KD-220Z|Digital Revio KD-25|"
     "Digital Revio KD-3300Z|Digital Revio KD-4000Z|"
     "Digital Revio KD-420Z|Digital Revio KD-520Z|Q-M100|Q-M200|"
     "Revio C2|Revio KD-20M|Revio KD-30M"),
    # Konica-Minolta DiMAGE gaps
    ("Konica-Minolta", "1/2.5", "DiMAGE E40|DiMAGE E50|DiMAGE E500|"
     "DiMAGE X1|DiMAGE X50|DiMAGE X60|DiMAGE Xg|DiMAGE Xt|"
     "DiMAGE Z10|DiMAGE Z20|DiMAGE Z2|DiMAGE Z3|DiMAGE Z5|"
     "DiMAGE Z6|DiMAGE G400|DiMAGE G500|DiMAGE G530|DiMAGE G600|"
     "DiMAGE 2330 Zoom|DiMAGE E201|DiMAGE E203|DiMAGE E223|"
     "DiMAGE E323|DiMAGE F100|DiMAGE F200|DiMAGE F300"),
    # Panasonic gaps: FP/FS/D-snap
    ("Panasonic", "1/2.33", "DMC-FP1|DMC-FP2|DMC-FP3|DMC-FP5|"
     "DMC-FP7|DMC-FP8|DMC-FS18|DMC-FS2|DMC-FS22|DMC-FS30|"
     "DMC-FS33|DMC-FS37|DMC-FS40|DMC-FS45|DMC-FS16|DMC-FS11|"
     "DMC-LZ20|DMC-LZ30|DMC-LZ40"),
    ("Panasonic", "1/3.2", "D-snap SV-AS10|D-snap SV-AS3|"
     "D-snap SV-AS30|SV-AV30|SV-AV50"),
    # Casio gaps
    ("Casio", "1/2.3", "EX-FR10|EX-TR10|EX-TR15|EXILIM EX-FC160s|"
     "EXILIM EX-FH150|EXILIM EX-FS10|EXILIM EX-G1|EXILIM EX-JE10|"
     "EXILIM EX-S200|EXILIM EX-TR100|EXILIM EX-TR150|"
     "EXILIM EX-Z16|EXILIM EX-ZR10|EXILIM EX-ZR100|"
     "EXILIM EX-ZR15|EXILIM EX-ZR20|EXILIM EX-ZR200|"
     "EXILIM EX-ZR300|EXILIM EX-ZR400|EXILIM EX-ZR700|"
     "EXILIM EX-ZR800|EXILIM EX-ZR1000|EXILIM EX-ZS5|"
     "EXILIM EX-ZS10|EXILIM EX-ZS12|EXILIM EX-ZS15|"
     "EXILIM EX-ZS20|EXILIM EX-ZS30"),
    ("Casio", "1/1.7", "EXILIM EX-S600D|EXILIM EX-S770D|"
     "EXILIM EX-Z850|EXILIM EX-Z1000|EXILIM EX-Z1050|"
     "EXILIM EX-Z1080|EXILIM EX-Z1200|EXILIM EX-F1|"
     "EXILIM EX-10|EXILIM EX-100|EXILIM EX-ZR3000"),
    # HP Photosmart gaps
    ("HP", "1/2.5", "Photosmart E327|Photosmart E337|"
     "Photosmart E427|Photosmart M22|Photosmart M23|"
     "Photosmart M307|Photosmart M407|Photosmart M417|"
     "Photosmart M425|Photosmart M437|Photosmart M447|"
     "Photosmart M517|Photosmart M525|Photosmart M527|"
     "Photosmart M537|Photosmart M547|Photosmart M627|"
     "Photosmart M637|Photosmart M737|Photosmart R507|"
     "Photosmart R607|Photosmart R707|Photosmart R717|"
     "Photosmart R725|Photosmart R727|Photosmart R742|"
     "Photosmart R817|Photosmart R818|Photosmart R827|"
     "Photosmart R837|Photosmart R847|Photosmart R927|"
     "Photosmart R937|Photosmart R967|Photosmart owlv2"),
]


def _aliases(make, model):
    """Alternative EXIF model spellings cameras of each brand emit.

    Manufacturers are inconsistent about marketing-name prefixes and
    dash/space in the EXIF Model tag (e.g. a Sony compact may report
    'DSC-W55' or 'Cybershot DSC W55'); the DB needs every spelling the
    wild emits (role parity with exif_reader.cc's exact-string lookup).
    Derived mechanically from our own canonical entries.
    """
    out = []
    if make == "Sony" and model.startswith("DSC-"):
        tail = model[4:]
        out += [f"Cybershot DSC {tail}", f"Cybershot DSC-{tail}",
                f"Cyber-shot DSC-{tail}"]
    if make == "Panasonic" and model.startswith("DMC-"):
        out += [f"Lumix {model}", f"Lumix {model.replace('-', ' ', 1)}"]
    if make == "Olympus" and model.startswith("u"):
        tail = model[1:]
        out += [f"mju {tail}", f"Stylus {tail}"]
    if make == "Fujifilm" and model.startswith("FinePix"):
        out += [f"{model} Zoom"]
    if make == "Casio" and model.startswith("EX-"):
        out += [f"EXILIM {model}"]
    if make == "Samsung" and model.startswith("Digimax "):
        out += [model[8:]]
    if make == "Konica-Minolta" and model.startswith("DiMAGE "):
        out += [f"DiMAGE{model[7:]}"]
    if make == "Kodak" and model.startswith("EasyShare "):
        out += [model[10:]]
    if make == "Pentax" and model.startswith("Optio "):
        out += [f"Optio{model[6:]}"]
    return out


def expand():
    rows = []
    seen = set()

    def add(make, model, width):
        model = " ".join(model.split())
        if not model:
            return
        # model field embeds the make unless it already starts
        # with it (Canon EXIF model strings do)
        full = (model if model.lower().startswith(make.lower())
                else f"{make} {model}")
        key = full.lower()
        if key in seen:
            return
        seen.add(key)
        rows.append(f"{make};{full};{width:g}")

    for make, fmt, models in ENTRIES:
        width = F[fmt] if isinstance(fmt, str) else float(fmt)
        for model in models.split("|"):
            model = " ".join(model.split())
            if not model:
                continue
            add(make, model, width)
            for alias in _aliases(make, model):
                add(make, alias, width)
    return rows


def main():
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "theiasfm_tpu", "data",
        "camera_sensor_database.txt")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    rows = expand()
    with open(out, "w") as f:
        f.write("\n".join(rows) + "\n")
    print(f"wrote {len(rows)} entries -> {out}")


if __name__ == "__main__":
    main()
