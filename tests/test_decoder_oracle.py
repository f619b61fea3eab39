"""Per-decoder parity against the reference binary via `-y` bit strings.

Every implemented protocol decoder gets at least one test vector; both the
reference rtl_433 (`-R <n> -y <code>`) and our registry run the same code
and the decoded JSON events must match field-for-field (the reference's
decoder-level test entry, ref src/rtl_433.c:1576-1685).

Vectors are chosen to *decode* (MIC-valid), so a silent regression on
either side fails the test.
"""

import json
import os
import subprocess

import pytest

from rtl_433_tpu.api import RtlTpu

BIN = "/tmp/rtlbuild/src/rtl_433"

# (protocol_num, code, expected_min_events)
VECTORS = [
    # 1 silvercrest: 33-bit row 2 (row 1 short), 0x7c 0x26 prefix, cmd+lut
    (1, "{1}0 {33}7c2625250", 1),
    # 2 rubicson: 36-bit x3, crc8(0x31,0x6c) over restructured nibbles
    (2, "{36}12a0d7ff9 {36}12a0d7ff9 {36}12a0d7ff9", 1),
    # 3 prologue: 9-prefix type, 36/37 bits x4
    (3, "{37}9aad0d7cd0 {37}9aad0d7cd0 {37}9aad0d7cd0 {37}9aad0d7cd0", 1),
    # 4 waveman: 25 bits, pair-coded nibbles
    (4, "{25}ffffea8", 1),
    # 19 nexus: 36-bit x3
    (19, "{36}9c80d7f2d {36}9c80d7f2d {36}9c80d7f2d", 1),
    # batch 1: OOK PPM temperature/humidity sensors
    (25, "{37}3400ed4760 {37}3400ed4760", 1),                 # gt_wt_02
    (47, "{42}054159b8820 {42}054159b8820 {42}054159b8820 {42}054159b8820", 1),
    (57, "{0} {0} {0} {0} {0} {42}056159b881c {42}056159b881c {42}056159b881c {42}056159b881c", 1),
    (35, "{0} {0} {42}054159b8820 {0} {42}054159b8820 {0} {42}054159b8820 {0} {42}054159b8820 {0} {42}054159b8820 {0} {42}054159b8820 {0}", 1),
    (85, "{37}1210d7ff10 {37}1210d7ff10 {37}1210d7ff10", 1),  # solight_te44
    (146, " ".join(["{36}9080baa3a"] * 12), 1),               # auriol_afw2a1
    (183, "{42}f200ef7c414 {42}f200ef7c414", 1),              # auriol_ahfl
    (91, "{40}0f80665761", 1),                                # infactory
    (53, "{36}5a10d7510 {36}5a10d7510 {36}5a10d7510", 1),     # springfield
    (56, " ".join(["{28}0340d76"] * 7), 1),                   # tfa_pool
    (84, "{32}db4157c2 {32}db4157c2", 1),                     # thermopro_tp11
    (97, "{41}387321bb818 {41}387321bb818", 1),               # thermopro_tp12
    (108, " ".join(["{24}0d7842"] * 4), 1),                   # wssensor
    (38, " ".join(["{24}42835c"] * 10), 1),                   # generic_temp
    # batch 2: remotes / switches / security
    (16, " ".join(["{36}480eb0a2f"] * 8), 1),                 # alectov1 T/H
    (68, " ".join(["{25}edcba10"] * 9), 1),                   # kerui
    (30, "{25}edcba98", 1),                                   # generic_remote
    (87, " ".join(["{20}80042"] * 4), 1),                     # generic_motion
    (46, "{41}ad552ac11d0", 1),                               # ht680
    (49, " ".join(["{18}edc80"] * 5), 1),                     # quhwa
    (48, "{25}edcbae0", 1),                                   # akhan_100F14
    (58, "{33}ce8e2a6c8", 1),                                 # blyss
    (62, " ".join(["{33}37f62a6c8"] * 5), 1),                 # elro_db286a
    (86, " ".join(["{24}5bd37f"] * 3), 1),                    # smoke_gs558
    (13, "{0} " + " ".join(["{40}552d70f2d0"] * 12), 1),      # mebus433
    (14, "{8}00 {64}563412abcd00053c", 1),                    # intertechno
    # batch 3: acurite family
    (10, " ".join(["{24}4205d7"] * 12), 1),                   # rain 896
    (11, "{40}4220d72d66", 1),                                # 609TXC
    (40, "{56}2dcbbbd2f6c040", 1),                            # tower 592TXR
    (40, "{64}2dcb8777e78ed243", 1),                          # 5n1
    (41, "{40}54482c40e6", 1),                                # 986
    (55, " ".join(["{32}4290d7fc"] * 3), 1),                  # 606TX
    (163, " ".join(["{25}0112bc0"] * 3), 1),                  # 590TX
    (74, " ".join(["{88}edcbbea9b40df4bffcdfb1"] * 3), 1),    # 00275rm
    # 75 lacrosse TX29/TX35: aa preamble, 2dd4 sync, type 9, BCD temp, crc8
    (75, "{88}aaaaaaaa2dd495c61528f8", 1),
    # batch 4: fineoffset family
    (18, "{48}ff4120d72da2", 1),                              # WH2
    (78, "{496}" + "00" * 40 + "aa2dd4e50272282721c9bb" + "00" * 11, 1),
    (78, "{192}d5555555aa2dd4245f85710327040100250000800000f441", 1),
    (78, "{96}55aa2dd4419702d003256f41", 1),                  # WH0290
    (142, "{144}aaaa2dd451006b586e7f24f8d2ffffff3c28", 1),    # WH51
    (79, "{71}fe71451e0401ffcea2", 1),                        # WH0530
    (79, "{63}fe71451e0401ffce", 1),                          # WS1200v1
    # batch 5: lacrosse family
    (8, "{44}0a050715714", 1),                                # lacrossetx
    (73, " ".join(["{40}bddd34d2fd"] * 5), 1),                # tx141th
    (166, "{288}aaaaaaaaaaaaaaaad2aa2dd41234560426703707b10e02d2d2d200000000000000000000", 1),
    (171, "{192}aaaaaaaad2aa2dd41234560426703731d2d2000000000000", 1),
    (170, "{128}d2aa2dd41234560407b10e0120035000", 1),        # wr1
    (175, "{224}fff00000aaaaaaaad2aa2dd43803220e00aa146a9300000000000000", 1),
    # batch 6: oregon scientific
    (12, "{168}ff5555559995a5a6aa6a9966aa666a9aaa965aaaaa", 1),  # THN132N v2.1
    (12, "{104}00000005f04285a0a840a206c0", 1),                  # THGR810 v3
    (50, "{32}a2a8403a", 1),                                     # Oregon-v1
    (54, "{38}d51435c168 {38}d51435c168", 1),                    # SL109H
    # batch 7: bresser
    (52, " ".join(["{40}bde99ad215"] * 3), 1),                   # 3CH
    (119, "{264}aaaaaaaaaa2dd4ffbde7cefdaeefdecfabedcfff00421831025110213054123000", 1),
    (172, "{176}aaaa2dd48bb9188002c318ff88ff3308118481fff0c4", 1),
    (173, "{240}aaaaaa2dd4561c9ac8b2a0baa8eadfaab89aaa8bfaefaabf8eabeaaaaaaa", 1),
    # batch 8: tpms
    (82, "{178}5556595656595a6566696a955a55a595659a6666a9a9c", 1),  # citroen
    (90, "{178}555655a595555a595956655a6966aaaaaaaa59aaffffc", 1),  # renault
    (89, "{178}555656595a6566696a959555656a65665955ffffffffc", 1),  # ford
    (60, "{68}00341234567644634", 1),                              # schrader
    (95, "{120}0000000000112233441234566450fa", 1),                # EG53MA4
    (168, "{110}f5555555ea95965699599a659a58", 1),                 # SMD3MA4
    (59, "{72}00007fb7d3f57dd9c3", 1),                             # steelmate
    # batch 9: misc A
    (204, "{80}fc0ca9a6a59a56555a69", 1),                          # jasco
    (92, "{137}2f84c208a000be1308228002f84c208a000", 1),           # ft004b
    (236, "{32}f15521f0", 1),                                      # gasmate
    (217, " ".join(["{72}555a75bd3ffffedc00"] * 3), 1),            # emos rain
    (109, "{1}0 {49}512b70101a160", 1),                            # wt1024
    (230, " ".join(["{42}4210d75a0a8"] * 4), 1),                   # vauno
    (332, "{21}ad2888", 1),                                        # tr_502msv
    (39, "{48}ff328015ff2f", 1),                                   # wg_pb12v1
    (121, "{48}ff0137410079", 1),                                  # opus_xt300
    (182, "{88}aa2dd4123456042950aa29", 1),                        # marbella
    (339, " ".join(["{30}49214008"] * 3), 1),                      # florabest
    (222, "{41}da7bba9fa38 {41}da7bba9fa38", 1),                   # rubicson_pool
    (158, "{48}5abdff28d2f0 {48}5abdff28d2f0", 1),                 # sharp_spc775
    (141, "{1}0 {40}bdd2ef2897", 1),                               # hg02832
    (125, "{72}fa428848c0aed200c4", 1),                            # ts_ft002
    (305, "{25}edcb540", 1),                                       # audiovox
    (331, " ".join(["{24}ff2828"] * 3), 1),                        # grill
    (80, "{232}ab10223344550678900000000000000000000000000000002a00006bcd", 1),
    (229, "{1}0 {1}0 {42}00000000000 {40}42e0665452 {1}0 {1}0", 1),  # wec2103
    (181, " ".join(["{96}65595555555559566655aaaa"] * 4), 1),      # abmt
    # batch 10: misc B
    (165, "{40}bded34d2b5 {40}bded34d2b5", 1),                     # tfa 303221
    (341, "{40}c02e11f473 {40}c02e11f473", 1),                     # esun
    (136, "{120}aa2dd41234567841440123c400641b", 1),               # esic
    (284, " ".join(["{64}429866f2d0000821"] * 8), 1),              # baldr_therm
    (114, " ".join(["{48}420d71310000"] * 3), 1),                  # maverick_et73
    (196, "{1}0 {74}aaeeaaaaeaaebaeeba8", 1),                      # atech
    (325, " ".join(["{32}4404bf07"] * 5), 1),                      # thermor
    (209, "{248}930b51de150112345678010203aabbccdd1111111111111111112e10000000", 1),
    (255, "{104}feb10012345678012345600f00", 1),                   # mueller
    (127, "{52}f5342012bff32", 1),                                 # ecowitt
    (132, " ".join(["{108}555666aa9a69695a659a9a6a59a"] * 2), 1),  # tfa_303196
    (43, "{140}e2a69a966a665a55aaaaaa99aa5a6995580", 1),           # oil_watchman
    (36, "{64}00341250100005ab", 1),                               # efergy_e2
    (220, "{104}aaaaaaaad391d3910962bc1234", 1),                   # maverick_xr30
    (251, "{120}aa2dd4551012340401238095000000", 1),               # wh55
    (206, "{60}a2dd4524001230c", 1),                               # tx34
    (17, "{24}ffff89", 1),                                         # cardin
    (360, " ".join(["{179}99669565a5599969a95655555555a9a559555555a6560"] * 4), 1),
    # batch 11: misc C (car remotes, TPMS, meters)
    (313, "{113}ff21e212345678000123abcdef5e0", 1),               # gm remote
    (303, "{48}b7d395e1fbd3", 1),                                 # chrysler
    (314, "{120}aa60017856341201002a1122334467", 1),              # siemens
    (312, "{88}55541234567880a0500078", 1),                       # mic6sc2
    (315, "{76}5512345678e0e001230", 1),                          # alps
    (203, "{182}33332ab52acb54b4d4cd54cd54aab555554aaaab2d2ac0", 1),  # porsche
    (248, "{114}f5555555e5aaa596569959a555680", 1),               # nissan
    (180, "{178}a6a65a5a56595a656669555666559669555555aaa5a50", 1),  # jansite
    (321, "{72}7ff811a2b3d10258d0", 1),                           # schrader moto
    (376, "{64}aaaa123445020a32", 1),                             # mcpower
    (239, "{104}edcb19ff9bcdfedca0ffbd78ff", 1),                  # revolt
    (149, "{96}550202140123451234567700", 1),                     # ert_scm
    (135, "{40}ffa56fde35", 1),                                   # philips 7010
    (333, "{268}00000000000000000000001528000000000000000000000a9400000000000000000", 1),
    # batch 12: security / home (Honeywell, DSC, X10, Interlogix, Govee)
    (70, "{160}5555566aa9a6a59a996aaa6a656a96aaaaaaaa00", 1),        # honeywell
    (23, "{48}f43894d2ad9c", 1),                                     # dsc_security
    (148, "{48}f43894d2ad9c", 1),                                    # dsc ws4945
    (22, "{0} {32}20df00ff", 1),                                     # X10_RF
    (100, "{60}01482ca50400000", 1),                                 # interlogix
    (192, "{48}edcbf404ff48 {48}edcbf404ff48 {48}edcbf404ff48", 1),  # govee
    (231, "{48}edcbfdfe6806 {48}edcbfdfe6806 {48}edcbfdfe6806", 1),  # govee h5054
    (115, " ".join(["{48}edcbafdfffbb"] * 4), 1),                    # honeywell_wdb
    (116, " ".join(["{48}edcbafdfffbb"] * 4), 1),                    # wdb fsk
    # batch 13: garage/gate/entry remotes and alarms
    (131, "{12}fff {66}12345678abcdef158", 1),                        # hcs200
    (218, "{12}fff {66}12345678abcdef158", 1),                        # hcs200 fsk
    (199, "{144}904100824020820824020820904100900900", 1),            # megacode
    (29, "{25}edcba78", 1),                                           # chuango
    (99, "{1}0 {41}5a55847b770", 1),                                  # x10_sec
    (167, "{137}f0f0ff4ccccacb4acacccd32b2cacb2cac8", 1),             # somfy_rts
    (169, "{52}e7a760b94372e {0}", 1),                                # nice_flor_s
    (151, "{37}b7a3b84648 {37}b7a3b84648", 1),                        # visonic
    (178, "{84}111111111117737731377|{84}711137111131773311113", 1),  # secplus v1
    (164, "{110}aaaa956aa99a6aa6aaa9aaa66a98"
          " {110}aaaa9566a99a6aa9a96999a5a668", 1),                   # secplus v2
    (179, "{208}43617669565659595a5a65655955a6aa99aa99999a9aa5a5a6a6", 1),
    (368, "{120}aaaaaad315274201020304050625cc", 1),                  # cavius door
    (128, "{58}1ffa95555554ab4", 1),                                  # directv
    # batch 14: classic weather stations
    (20, "{56}01457723455028", 1),                                    # ambient f007th
    (32, "{88}ffa12123500a14032124dd", 1),                            # wh1080 ook
    (155, "{120}aaaa2dd4a12123500a14032124dd00", 1),                  # wh1080 fsk
    (69, "{80}ff5f51934800001246aa", 1),                              # wh1050
    (33, "{36}c13383b31", 1),                                         # wt450
    (34, "{52}0901201550aab", 1),                                     # lacrossews
    (71, "{104}55666aa66a6596a5a66a55a9a9", 1),                       # maverick
    (31, "{36}e44b70730 {36}e44b70730", 1),                           # tfa twin plus
    (37, " ".join(["{36}120045673"] * 3), 1),                         # kw9015b
    (129, " ".join(["{36}770045012"] * 3), 1),                        # eurochron
    (162, " ".join(["{36}9ab100d55"] * 4), 1),                        # thermopro tx2
    (42, "{90}068ca3d0f539e465ff9823c", 1),                           # hideki ts04
    # batch 15: energy / utility meters
    (44, "{173}333333316ea2aab2cad4aab2aaacaaab4b2aaaaaaaa8", 1),      # currentcost
    (45, "{287}aaaaaa5ba40a34c8019dfe00000001ea01ae017017701770177017"
         "701668240200719754", 1),                                    # emontx
    (63, "{96}0012344000000000320f93dc", 1),                          # efergy opt
    # esa: first vector is IQ-replayable — the zerobit slicer hardcodes a
    # leading 0 (pulse_slicer.c:478) so an on-air 176-bit frame must start
    # 0; the decoder skips the first 16 header bits (esa.c:98) so the
    # 0xAAAA-headed variant (second) only exists at the bit level
    (117, "{176}55558ca2f2173b5f839782a6aed2f61a3d89adfffa24", 1),
    (117, "{176}aaaa8ca2f2173b5f839782a6aed2f61a3d89adfffa24", 1),    # esa
    (154, "{128}16a31eab04115cdb00001ae349005d27", 1),                # scmplus
    (334, "{48}55a501020300", 1),                                     # rfxmeter
    (176, "{32}01bbcc69 {32}01bbcc69", 1),                            # blueline id
    ("176:13124", "{32}01eac74c", 1),                                 # blueline gap
    (160, "{736}16a31c5cc6040700ac129df6bc420516af2d07000041482608410500053004"
          "0000000000000000000000000000000000000000000000000000000000000000"
          "00000000000000000000000000000000000000000001dceabab3e30000", 1),                                 # ert_idm
    (161, "{736}16a31c5cc6040700ac129df6bc420516af2d07000041482608410500053004"
          "0000000000000000000000000000000000000000000000000000000000000000"
          "00000000000000000000000000000000000000000001dceabab3e30000", 1),                                 # ert_netidm
    # batch 16: Fine Offset / EcoWitt FSK family part 2
    (113, "{176}aaaa2dd430c3820a5edfbc0756a7ae00000000000000", 1),    # wh31e
    (219, "{192}aaaa2dd445003660027e36402300290229074f0000000000", 1),  # wh45
    (221, "{104}aaaa2dd43400296502854466f3", 1),                      # wn34
    (190, "{104}aaaa2dd4578105c8058101df0b", 1),                      # wh31l
    (213, "{176}aaaa2dd4800a003b001050885938186d1c00ffff7855", 1),    # ws80
    (244, "{290}aaaa8b7524000d0ac01de920988e400f80000fffc8002e8000"
          "0980803fe7fe000020a493c", 1),                              # ws90
    (112, "{74}1149508d6eb6af7285c", 1),                              # tx8300
    # batch 17: TPMS part 2
    (110, "{140}faad4ab2d52d3532b55352b534d2aad552a", 1),             # pmv107j
    (123, "{136}55555656595a6566696a596965659a9696", 1),              # jansite
    (140, "{144}7155956a9a5959566659655656555aaa9955", 1),            # elantra
    (156, "{168}555556565659595a5a656555666a956569595666a9", 1),      # abarth tg1c
    (186, "{192}555555565956a599aaa99a999aa9555a9669665566669a56", 1),  # vdo
    (201, "{192}55555699556695569a59955655595a55555556a9969a5555", 1),  # truck
    (226, "{154}ed715569969a655956665965565655aaaa99aa4", 1),         # kia
    (208, "{168}cccccccd2d2ccacb32ccaaab4d4ab52cb354cb5555", 1),      # ave
    # batch 18: TPMS part 3
    (225, "{88}fd5fd5f6b20d21e82f00ac", 1),                           # tyreguard
    (241, "{80}000074f2e88170b5efff", 1),                             # eezrv
    (252, "{192}aa59555a595aa9565a6999566a6569595556699a55655566", 1),  # bmw g5
    (257, "{194}cccd54cab4aaccab4cb4d54b4ab4ccd55552aaacb3534aad4", 1),  # bmw g3
    (275, "{130}0000000000000103123456789a64556b0", 1),               # gm
    (212, "{176}555699569a59a55aa5556a95656956659a9995555555", 1),    # renault
    (343, "{112}32b44d32acccccccccccaaaaad2d", 1),                    # smartire
    (365, "{92}00283deadbeef6e4c6be9c8", 1),                          # mercedes
    # batch 19: remotes / home automation part 2
    (64, "{390}ff000000000000000000000000000000000000000000000000000000"
         "00000000000000000000ff00000000001234ab0000", 1),            # honda
    # ford: first vector is IQ-replayable — DMC row breaks need a dangling
    # 1 (pulse_slicer.c:560-567) so the {9} row ends '1'; the decoder only
    # checks its first byte (fordremote.c:41). Second is the classic
    # all-zero {9} shape (bit-level only)
    (93, "{1}8 {9}0080 {1}8 {78}abcdef00000000420000", 1),
    (93, "{1}8 {9}0000 {1}8 {78}abcdef00000000420000", 1),            # ford
    (94, "{112}ffed3affb9fed3affb9fed3affb9", 1),                     # philips
    (98, "{88}ccccccff00acb2cb2cb2ca", 1),                            # ge color
    (101, " ".join(["{16}bea8"] * 4), 1),                             # dish rc63
    (61, "{71}091430892288512450", 1),                                # lightwave
    (77, "{131}00007d5b37800200000096805f64bee00", 1),                # vaillant
    (111, "{17}000000 " + " ".join(["{54}0730800042053c"] * 3), 1),   # ttx201
    (102, "{92}cc5f7773b333d3531fbf6ff {92}cc5f7773b333d3531fbf6ff", 1),  # ss
    (67, "{136}55555551cdb31b1cb32b2ab2c71cc69b19", 1),               # radiohead
    (103, "{196}55555551cdb0d6b2b1cb32b26b1cb2cb1c2dab2ca5655ab1c", 1),  # sensible
    # batch 20: home sensors part 2
    (21, "{0} {21}53af50 {21}53af50", 1),                             # calibeur
    (24, "{25}fabaae8", 1),                                           # brennenstuhl
    (26, "{254}aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa365ca9c8e4e5cb4969"
         "9a596968bb15b0", 1),                                        # danfoss
    (72, " ".join(["{24}491a84"] * 3), 1),                            # rftech
    (81, "{98}5562a69a966aaaaa5a6aaaa80", 1),                         # oil std fsk
    (83, "{98}5562a69a966aaaaa5a6aaaa80", 1),                         # oil std ask
    (118, " ".join(["{36}422105190"] * 4), 1),                        # bt_rain
    (120, "{48}5f425140ece0", 1),                                     # xc0324
    (126, " ".join(["{14}0c08"] * 3), 1),                             # companion
    (133, " ".join(["{32}01507a25"] * 10), 1),                        # rubicson48659
    (137, " ".join(["{33}1262bc8c0"] * 5), 1),                        # gt_tmbbq05
    (138, " ".join(["{41}e8cffefa348"] * 3), 1),                      # gt_wt_03
    # batch 21: weather / utility part 3
    (150, "{88}b42b482c410aa2060e6ace", 1),                           # klimalogg
    (145, "{112}0aedcbffbedcc8f5ebfffeeffa32"
          " {112}0aedcbffbedcc8f5ebfffeeffa32", 1),                   # ws2032
    (157, "{0} " + " ".join(["{40}42000fa00f"] * 5), 1),              # missil
    (147, "{66}cedcbaffaa55ff1c8 {66}cedcbaffaa55ff1c8", 1),          # tfa_drop
    (134, "{192}aaaaaa98f3a51234011550230c40000000007d0000000000", 1),  # holman
    (143, " ".join(["{96}555a6788ff05c8feda7b72ff"] * 3), 1),         # holman pwm
    (340, " ".join(["{96}555a6788ff05c8feda7b72ff"] * 3), 1),         # holman ook
    (144, "{152}aaaaaaaad391d3910861cfd3f19e34abc87098", 1),          # archos
    (139, "{55}05b5b63f3ffcbe", 1),                                   # norgo
    (124, "{58}018a6b9486a56c4", 1),                                  # ws7000
    # batch 22: home sensors part 3
    (152, "{48}d4e1b05fba24 {48}d4e1b05fba24", 1),                    # efth800
    (153, "{124}0140570234e5a0150029a3700c81e55", 1),                 # cotech
    (205, "{304}14e123000c172b00000000000000000000000000001"
          "21b0000436e4c9223274900000000008a", 1),                    # telldus
    (214, " ".join(["{120}555a7cbd6777ce14af05c8f5abd0ff"] * 3), 1),  # emos
    (194, "{192}aaaaaa2dd4d3910f0001030158a221d600f400d3013cff00", 1),  # inkbird
    (195, "{238}aaaaaaaaaaa9999a555aa6aa9556569965555555965559555"
          "55656666654", 1),                                          # rainpoint
    (232, "{64}aaaa5c28a0ffce69", 1),                                 # tfa 1504v2
    (246, "{120}aaaa2dd45f59934800000096c60000", 1),                  # tfa 303151
    # batch 23: BBQ / meat thermometer family
    (245, " ".join(["{45}95000d70a000"] * 4), 1),                     # tx2c
    (256, "{240}d2aa2dd4280206260000280211070000a2906d70a70000000000"
          "00000000", 1),                                             # tp28b
    (267, "{120}552dd4770c2eceaa4f3eddeaa4d7cb", 1),                  # tp828b
    (259, "{96}552dd4082f2efeddeddedde8", 1),                         # tp829b
    (278, "{96}552dd4e800293017aa55aa83", 1),                         # tx7b
    (294, "{168}d2552dd49c4a2bc2c50b3f4cb30000000000000000", 1),      # tp86xb
    (297, "{88}552dd4011ed6036caa14ff", 1),                           # tp211b
    (177, "{80}e0ddff6fadbbebda1ae1", 1),                             # burnhard
    (281, "{216}d2aa2dd40806f00041a1f4f00091a410f0005aa1f4f000a50672"
          "6a", 1),                                                   # xr50
    (377, "{208}5754123456000800102711271227132714272202640105007402",
     1),                                                              # typhur
    # batch 24: fineoffset part 3 (wh43 omitted: reference segfaults on a
    # MIC-valid packet due to float-as-DATA_INT varargs UB in battery_pct)
    (262, "{192}aa2dd4460027f102b53340324039030b002a00360190e416", 1),  # wh46
    (287, "{288}aaaa2dd4850028eb87826f0083003fff000000000b0b0000ffef"
          "fd00006b316e00000000", 1),                                 # ws85
    (353, "{216}aa2dd4a2123456026c32000190000600000051000000000000a6"
          "6c", 1),                                                   # wh52
    (356, "{47}fe8821ae5bd4", 1),                                     # wh5rb
    # batch 25: home sensors part 4
    (247, "{176}aaaa2dd427f380025288517000000000000000000000", 1),    # leakage
    (249, "{112}aaaa2dd49b02b89e8bfa98a3aaaa", 1),                    # lightning
    (268, " ".join(["{38}3e8058c6d0"] * 3), 1),                       # st1005h
    (261, " ".join(["{73}78ffd61fd455aa55960"] * 3), 1),              # tx16
    (291, " ".join(["{73}75ffd0cfae55aa554c0"] * 3), 1),              # tx19
    (250, "{65}a1f88cf6ff3506550 {65}a1f88cf6ff3506550", 1),          # schou
    (242, " ".join(["{36}75b8002a3"] * 3), 1),                        # baldr
    (254, "{9}598 {9}0d8 {9}338 {9}658 {9}400 {9}400 {9}6c8 {9}7f8 "
          "{9}6b8 {9}708 {9}2f8 {9}000 {9}7d8", 1),                   # thermor
    (243, "{328}cccccccc55555555555a55a555aa5a55aaaa55555a5555555a5a"
          "5a5a555555555555555555555555f0", 1),                       # celsia
    # batch 26: utility metering / monitoring
    (253, "{54}5ab24971f79994", 1),                                   # watts
    (234, "{196}aaaaaaaaaa2dd40e040100259e804faa602801050300253d0",
     1),                                                              # sonicadv
    (235, "{156}5555589999996a6559aaa999969aa6aa9a6995f", 1),         # oil smart
    (237, "{240}aaaad391d39115017856341200254a3565102700000000000000"
          "0000adda", 1),                                             # flowis
    (351, "{64}aa2dd4001f0081a0", 1),                                 # ecoeye
    # batch 27: remotes / home automation part 3
    (191, "{41}5be99bbf8d0", 1),                                      # markisol
    (270, "{112}aaaaaaa423123402d51c00000000", 1),                    # quinetic
    (211, " ".join(["{21}559f80"] * 4), 1),                           # regency
    (210, "{13}5090 {13}51a0 {13}5560 {13}5080 {13}5008 {13}5fe8", 1),  # yale
    (207, "{182}e5659ab96995ae66695ba55596e5a665b955556e555558", 1),  # proflame
    (202, "{48}2ca2c4802892", 1),                                     # funkbus
    # batch 28: remotes / home automation part 4
    (187, "{136}aaaad391d39108123456211a0042192f58", 1),              # rojaflex
    (286, " ".join(["{33}12345bbb8"] * 3), 1),                        # unifan
    (335, "{22}850300 {22}850300", 1),                                # martec
    (233, "{201}aa4d5e59a5659599559959a565959656a96955555555555555"
          "58 {201}aa4d5e59a5659599559959a565959656a9695555555555555"
          "558", 1),                                                  # ced7000
    # batch 29: TPMS part 4
    (295, "{200}555555566656595a6566696a955659965556a96965a66aa66a",
     1),                                                              # airpuxem
    (298, "{98}00015c1234567862534b0e344", 1),                        # trw ook
    (299, "{98}7fff5c1234567862534b0e344", 1),                        # trw fsk
    (322, "{88}2594b5f6e4d086b697e2e2", 1),                           # gearhive
    (355, "{160}aaaaaaaa665659566555656a9a655a5566556656", 1),        # ty468
    (354, "{160}aaaaaaaa665659566555655655555a5566556656", 1),        # imars
    (362, "{172}99aa5a6a9aa99a9a6a965aaa5a55559a5aa95aa99a9", 1),     # ty588
    (352, "{110}f5555555ea95965699599a655558", 1),                    # nis315g3
    (328, "{61}7fff02468ad10540", 1),                                 # mrxbc5a4
    (380, "{196}55555556655956595a6566696a9559566965665566666595f",
     1),                                                              # jeep
    (381, "{151}dae3552d3534cb534d4b35332d2ad4ad534cac", 1),          # honda
    (378, "{184}aa669996a6565659595a5a656595665955696999a659aa", 1),  # sefis
    # batch 30: car remotes
    (301, "{52}2bd4123456784", 1),                                    # astrostart
    (302, "{36}1234ff806", 1),                                        # compustar
    (304, "{160}fffffffffffffffffffffff0ffbdedcba9ac6543", 1),        # nidec
    (316, "{144}000f0f06123456780030000042deadbeef58", 1),            # continental
    (327, "{152}ec0f62081234567821000102deadbeef020000", 1),          # honda fob
    (317, "{60}00000c82468ace0", 1),                                  # code alarm
    (370, "{168}555556a9a6a59a9996956aa69966655a5999a996a6", 1),      # 2gig
    # batch 31: wireless M-Bus
    (104, "{240}543d543d1944685078563412011b7a4200000002659f0802fb1a"
          "3601d81a", 1),                                             # C fmt B
    (104, "{256}543d54cd1744685078563412011b26a37a4200000002659f0802"
          "fb1a3601e0b4", 1),                                         # C fmt A
    (104, "{352}543d35371c6ac6564ec65a2dc34e58d36339a98b4e670e596596"
          "59658e6999695ac58ea633662da58dc968dc", 1),                 # mode T
    (238, "{240}543d543d1944685078563412011b7a4200000002659f0802fb1a"
          "3601d81a", 1),                                             # T dnlink
    (105, "{472}547696a9959a9a966a99aa956a9996a59aa9a6aaa9a965a69666"
          "a595669aa6aaaaaaaaaaaaaaa696996955aa6aaaa65565a966a596aaa9"
          "56aa659a", 1),                                             # mode S
    # batch 32: round-2 oracle-gap closure (VERDICT r1 item 3)
    (88, "{160}a9eab52acb54b4d4cd552d54b2d5352d2ccb32d0", 1),  # tpms_toyota
    (76, "{72}aaaa2dd495c6156aa7", 1),                         # lacrosse_tx29
    (279, "{36}77bf03701 {36}77bf03701 {36}77bf03701", 1),     # nexus_sauna
    (265, "{55}dd512269594830", 1),                            # rosstech_dcu706
    (106, "{256}555476961744685078563412011b26a37a420000000265"
          "9f0802fb1a3601e0b4", 1),                            # m_bus mode R
    (107, "{144}55f68d000000000000000000000000000000", 0),     # m_bus mode F
    (130, "{192}aaaad201112000070ea22738bed0882f9b47d1248e354b00", 1),
    (307, "{12}aaa {67}123456789abcdef5e", 1),                 # hcs361 txwak01
    (308, "{12}aaa {67}123456789abcdef5e", 1),                 # hcs361 txwak10
    (309, "{12}aaa {67}123456789abcdef5e", 1),                 # hcs361 txwak11
    (310, "{12}aaa {67}123456789abcdef5e", 1),                 # hcs361 vpwm10
    (311, "{12}aaa {67}123456789abcdef5e", 1),                 # hcs361 vpwm11
    # kaku family: sync-marked PPM, expressed as RfRaw pulse trains
    (15, "AAB104012C0A5A05780CE481808282808280808282808082828080828280828082808280808280828280828080828280828082808280808280828280808282808082828080828082828080828355", 1),   # newkaku
    (51, "AAB104012C0A5A05780CE481808282808280808282808082828080828280828082808280808280828280828080828280828082808280808280828280808282808082828080828082828080828355", 1),   # proove
    (96, "AAB104012C0A5A05780CE481808282808280808282808082828080828280828082808280808280828280828080828280828082808280808280828280808282808082828080828082828080828355", 1),   # nexa
    (379, "{377}0ffffffff7c688d1191366622d5599b77611d339570b6d0da185"
          "b08680cbda8300600c01903536f9c219a734689dc58", 1),          # radian
    # batch 32: misc D
    (184, "{68}a5c802017300043170", 1),                               # aft77b2
    (200, "{52}1a8088f000145", 1),                                    # 4ld5661
    (357, "{36}123490d77 {36}123490d77", 1),                          # hg04641a
    (193, "{369}b000000060000000000c6c060db1b60306000000000000300000"
          "0060000000000c6c060db1b603060000000000000", 1),            # cmr113
    (197, "{56}bd3f5fc42fe268", 1),                                   # 01185m
    (326, "{56}0000c4482c0077", 1),                                   # acurite985
    (174, "{144}aaaaaa2dd48c74d4b93eb322384451550000", 1),            # ecodhome
    # batch 33: Govee FSK family
    (300, "{208}2c4c4a16055407ffa4e7736c435930655a6a616333533741e2fb",
     1),                                                              # h5059
    (349, "{160}2c4c4a1005548ee8a4e7770869dbfc9a5a6a95c7", 1),        # h5310
    (350, "{280}2c4c4a1f0534647ba4e7174a118d41655a6a676332533641504"
          "3564c674c787a46d70c", 1),                                  # h5112
    # batch 34: LaCrosse part 2
    (240, "{88}aaaa2dd4a2020653106817", 1),                           # tx31u
    (323, "{96}aaaa2dd4a283065310687700", 1),                         # tx22uit
    (324, "{96}5555d22b5d7cf9acef9788ff", 1),                         # tx22 ook
    (374, "{96}d2aa2dd4123456142a5037ae", 1),                         # tx232th
    (375, "{128}d2aa2dd412345614010203040506d79c", 1),                # tx231rw
    # batch 35: weather / garden part 4
    (263, "{272}aaaacaca54aa0012340002d23701512801510165040165009700"
          "0000000000000000", 1),                                     # vevor
    (293, "{426}fc95004010042311467224ab3340100401004010040b0040100"
          "5cd0046f0040100401004210044100569004150040100401085ab26c",
     1),                                                              # sainlogic
    (292, "{56}edcbffff194fd3", 1),                                   # wallarge
    (319, "{72}e8ceacfa1ccdaafaa0 {72}e8ceacfa1ccdaafaa0", 1),        # wl-th6r
    (280, "{65}55aaedcbd2e9dbbf8", 1),                                # homelead
    # rainpoint: first vector is IQ-replayable — NRZ row-break gaps in
    # (gap_limit, reset] always append exactly round(gap/long)=2 capped
    # zeros, so a 163-bit row must end '1'+'00' on the air; the decoder
    # caps rows at 163 bits (rainpoint_hcs012arf.c:65)
    (276, " ".join(["{163}996695956565a5a559595955a955a6a95555"
                    "55a58"] * 4), 1),
    (276, " ".join(["{163}996656a9699959a5659555555555596955555"
                    "6a94"] * 4), 1),                                 # rainpoint
    # batch 36: misc E
    (361, "{60}ccb2cd53332d32b", 1),                                  # kidde
    (346, "{190}fffe0002aaaaaaaaab2b2848d15811a80ff00e100e12a9b4", 1),  # en2058
    (347, "{224}4b2dd42b18a5010203004200e7000000e5000000e6000000eab"
          "b8f46", 1),                                                # tfa 390x
    (367, "{360}0000d2b9691e41bbb3222791c0d4eda4aed4b0715f2d5d437a9"
          "6142a48b1af42238329f30bc93977b23efb21cf", 1),              # tfa 3307
    # batch 37: misc F
    # marlec: first vector is IQ-friendly (no zero run > max_zeros=15, so
    # the NRZ slicer keeps the frame whole); second has realistic all-zero
    # registers that split any IQ replay on both sides (bit-level only)
    (188, "{368}aaaad391d39125181f222d343b424950575e656c737a81888f96"
          "9da4abb2b9ca39300101e3eaf1f8ff060d140dbe", 1),
    (188, "{368}aaaad391d39125000022000005000100000000000000002c0110"
          "2700000000cae80300000000000000000000a30d", 1),                                    # marlec
    (215, "{304}aaaacaca54aaa16e95a38aae2daaaaaaaaaaaaaaaaaaaaaaaaaa"
          "aaaaaaaaaaaaaaaaaaaa9c00", 1),                             # emax
    (359, "{53}fff094692b5c10", 1),                                   # watchman+
    (224, "{120}aaaa7bb93f062905346400010086d0", 1),                  # geo ct
    (224, "{416}55557bb9ea01352a3c0000000000000000000840000000000000"
          "0000aaaaaaaaaa0010000c22aaffff00000000aaffaaaa00df25", 1),  # geo dp
    # batch 38: misc G
    (348, "{160}d391d3910dfffffe0212345600e600d2646603e2", 1),        # wfht lcd
    (358, "{80}000fe032ccad52b5554a", 1),                             # eberle
    (371, "{40}bdeb731db8", 1),                                       # hanwell
    (369, "{72}1425103250b4ffff91", 1),                               # ft0203
    (382, " ".join(["{60}ab8e6e000000123"] * 8), 1),                  # 367900
    # batch 39: Microchip KeeLoq
    (306, "{6}fc {67}f77db57b6a2c4805e", 1),                          # hcs361
    (310, "{6}fc {67}f77db57b6a2c4805e", 1),                          # hcs361 vpwm
    (329, "{12}fff {69}f77db57b6a2c480510", 1),                       # hcs362 pwm
    (330, "{24}aaaaaa {144}aa9a9aa9a6999aa69a665669596555599595", 1),  # hcs362 mc
    # batch 40: misc H
    (344, "{37}b9aaeabbb8", 1),                                       # dickert
    (345, "{758}aaaaaaaaabd2ccd32ad4d4d55543d2ccd32ad4d4d55543d2ccd32ad4d4d55543d2ccd32ad4d4d55543d2ccd32ad4d4d55543d2ccd32ad4d4d55543d2ccd32ad4d4d55543d2ccd32ad4d4d55543d2ccd32ad4d4d55543d2ccd32ad4d4d55543", 1),                                      # fsl
    (363, "{264}aad391d391e601ffdae2062220edcbff39ffb037ff6bffffffff"
          "ffffffffff366c", 1),                                       # wmr500
    (336, "{256}aaaae71219015a91027dad570d000000000000000035000000007"
          "6000158693c", 1),                                          # netatmo
    (337, "{80}030e6000000000002cb1 {80}030e6000000000002cb1", 1),    # omni
    # batch 41: misc I
    (285, "{88}edcba94b5fd3ffb4ffb54e", 1),                           # bm5
    (288, "{227}aaaaaaaaaaaa66aa5565559565595599956555555555556555559"
          "9690", 1),                                                 # oria
    (264, "{96}5555aafa01dee7635ea1ffff", 1),                         # arexx
    (258, "{136}552dd400024b1508c10102592e08b0e96b", 1),              # cwpirc
    (274, "{120}2ab07ea05a16603a84008710e000a3", 1),                  # revolt
    # batch 42: misc J
    (6, " ".join(["{107}000060285e0847924d0089c03f6"] * 3), 1),       # em1000
    (7, "{60}00314d4a90d4b1b", 1),                                    # ws2000
    (122, "{58}ffeede5bbddd924", 1),                                  # fs20
    # batch 43: misc K (rfm69 omitted: reference segfaults on valid frame
    # due to int-as-DATA_STRING varargs UB)
    (320, "{64}aad39178554c3358", 1),                                 # ctt tag
    (271, "{786}aaaa005ff2a557005c5445112259911555335dd08c0100501205810040100401004010440100401004014048160441504c10040100401004010040100401004010040100401004010040100401004010040100401004010040100401004010052921c", 1),                                       # gridstream
    (272, "{786}aaaa005ff2a557005c5445112259911555335dd08c0100501205810040100401004010440100401004014048160441504c10040100401004010040100401004010040100401004010040100401004010040100401004010040100401004010052921c", 1),
    (273, "{786}aaaa005ff2a557005c5445112259911555335dd08c0100501205810040100401004010440100401004014048160441504c10040100401004010040100401004010040100401004010040100401004010040100401004010040100401004010052921c", 1),
    # batch 44: water/pool meters
    (223, "{144}543d4ec65a2dc59635639359658d6ac5a900", 1),            # badger
    (282, "{232}aaaaec62ec62ebe11d9aed455b5cee7bf23a3075560a7e7d2dd8"
          "6ab2a5", 1),                                               # orion ep
    (290, "{232}aaaaec62ec62ebe11d9aed455b5cee7bf23a3075560a7e7d2dd8"
          "6ab2a5", 1),                                               # orion 2020
    (227, "{136}aaaaaad391d3910701fffff55f0da75e7f", 1),              # srsmith
    (228, "{224}555555a966696533a965aaa63956c33a63333c33665a36cc5aa9"
          "aaa3", 1),                                                 # neptune
    # batch 45: misc L
    (372, "{271}a723a723c946b115d108446dbc59801a4d0ac6b8aad85bb790e1"
          "562211df35443b98", 1),                                     # elero
    (364, "{312}0a7942bdf22106f057efdff0f3cb4d764dc7072051159a0f89f2"
          "c6dacae344bb311245fd6f0d00", 1),                           # elsner
    # batch 46: misc M
    (366, "{336}aad391d39122d0374654c6001234568d1100018a0284034b02d0"
          "8e051e03cc000000004c0000deba09e7", 1),                     # watts_v
    (289, "{550}d4018c7e67bf2e4b15f2b3b404fc2bdace27e30ba759a5be0edc"
          "bff0f5e2b070f59d89ec5459cef2a6cddb6adf8c4e48754630963"
          "3d08e4a092fba1d16749519e5de63c5c0", 1),                    # ec3k
    (289, "{370}aaaaaa80d7a40aeafb8fef93a3a6beed9b464d6f34edebfd0771"
          "dd706ceb9da8f08fba16d6ccad05ec4698a2e92a80", 1),           # ec3k 2
    # batch 47: elster + apator
    (338, "{336}7d5d4761032d5555555555545756515053525d5c5f5e59585b5a"
          "45444746414043424d4c4f4e4948dba1", 1),                     # beacon
    (338, "{576}13555761032d5555455455555555555566549b17555554575454"
          "56553154795552555555555555555555555555555555555555555555"
          "5555555555555555656c555555555555d3f5", 1),
    (373, "{576}aaecafa89efcd2aaaabaa8a3aaaaaaaafdaaaaaaaaaaaaaaaaaa"
          "aaaaa8aa7407aaabaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa7407aaa8"
          "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa567", 1),
    (277, "{208}aaaa699aec2eb8618c689b45ea7ad2397097570a94122dd818e9",
     1),                                                              # erm30
    (296, "{192}aaaa699aee5d80cee5dd3424ea7ad23a76a5310a547d2152", 1),
    # batch 48: risco, enocean, ant, somfy
    (266, "{272}555accccb2aaaaab32ab2b352cb2aaab4cb53332ad2aaacab2aa"
          "b2aaaaaab4aad332", 1),                                     # risco
    (198, "{95}aacbb5ccdabd4ad25ddd5d56", 1),                         # enocean
    (216, "{144}aaa6c53412780a0001020304050607085f11", 1),            # ant+
    (189, "{274}57fd9937c09004017e4b759caf005014340100401005a15dd7f3"
          "8d5f7b5515acab3c40", 1),                                   # somfy
    # batch 49: insteon, deltadore
    (159, "{287}3155532a8acd552952d3348d2b2b2932caca8b2ab5494ad3328c"
          "ad2ca92acaaa8aacd550", 1),                                 # insteon
    (269, "{328}aaaa8169967edc78bd58b8d99a10565e4b940eebe26438beb41a"
          "b6b05cf1e79aeb53ec2d53c6a1fe35", 1),                       # x3d std
    (269, "{200}aaaa8169967eec78bf5998808f41555e0a9d0e91bc502a886c",
     1),                                                              # x3d wnd
    # batch 50: honeywell cm921
    (185, "{300}555ff00599555954acb352ccb4cd552d52b32d4b2ad2d2ad4b2a"
          "cab2acad554b534d53565550", 1),                             # setpoint
    (185, "{420}555ff00599555954acad32cad335354b4cd2b4ad2cd354d54b52"
          "cab2d52d2acd32acab2acad2cd4b2ad2b2ad534d4ab33555565550",
     1),                                                              # temps
    # batch 51: vivint (incl. seeded Rabbit-cipher status decode)
    (342, "{92}00185ffbda3fec84125c6530", 1),                         # 7a raw
    (342, "{92}0012ffffefffec84125863f0", 1),                         # d0
    ("342:0019-0507610=05c9", "{92}00185ffcf5bfec84125ab880", 1),     # seeded
    # batch 52: arad dialog3g (incl. syndrome error correction + args)
    (260, "{184}c196f5138537b4bf1dfe8cff15b6f7fffa7eb21ca0df00", 1),
    (260, "{184}c196f5138537949cffffd8ff17fcfffff79f003bf47f00", 1),
    (260, "{184}c196f5138537b0bf1dfe8cdf15b6f7fffa7eb21ca0df00", 1),  # 2 errs
    ("260:gear=10,units=l",
     "{184}c196f5138537b4bf1dfe8cff15b6f7fffa7eb21ca0df00", 1),
    ("260:serials=99-39",
     "{184}c196f5138537949cffffd8ff17fcfffff79f003bf47f00", 1),
    # batch 53: silver spring mesh (seed-scan descramble + TLV walk)
    (383, "{311}aaaa18bfabffc74f5f44cc607755b77f85ef19d60a696111300d"
          "6c12ac72b3598e248a0b6ae3d0", 1),                           # poll
    (383, "{527}aaaa18bfabff914b5f44cc607755b77e85b859dc2aa3e7533408"
          "6446ad7697318727ba28483cb29dbcc4dbf590a1bda70bc037641553"
          "ce80c9ef34a93240887f0cec", 1),                             # route
    (383, "{751}aaaa18bfddff5906191ea95da506e78aee1a3e0f2ca46fb136cf"
          "c580cd683ff00deb0551f3a99e2293dcaa9f23353e93dd14241e5949"
          "5b6d6e6077bb59918de01ec60a9a273689531998ad7697318727ba28"
          "487c90b09ce6f91d70db971a", 1),                             # ipv6
    # batch 54: bresser garden (full message-type coverage)
    (384, "{312}aaf3e9105e519c0d001fb50500470f09090e060008882f859402"
          "000000000000000000000012c5", 1),                           # 0x09
    (384, "{312}aaf3e9105e51c20e00019c0d001f230a0906061708882f859402"
          "00000000000000000000005ac0", 1),                           # 0x0a
    (384, "{312}aaf3e9105e519c0d001fc20e0001238a01000000000000000000"
          "000000000000000000000039d0", 1),                           # 0x8a
    (384, "{312}aaf3e9105e51c20e00019c0d001f17040e060101adaee4192105"
          "0000003c00000000000000d8e0", 1),                           # 0x04
    (384, "{312}aaf3e9105e519c0d001fc20e00012a850f0078000f002c01062e"
          "00004200ec0000000000009490", 1),                           # 0x85
    (384, "{312}aaf3e9105e519c0d001fc20e00012b860f01bf9e4c5802000080"
          "00882c01640000000000001e01", 1),                           # 0x86
    (384, "{312}aaf3e9105e51c20e00019c0d001f2c020f060b01419f1e000000"
          "81b004adb00400000000001708", 1),                           # 0x02
    (384, "{312}aaf3e9105e5100000000b50500470101080eff47470000350700"
          "000000000000000000000018f1", 1),                           # 0x01
]


def _ref_events(num, code):
    """Run the reference on a test vector. A ``|`` in the code separates
    parts decoded by successive calls (one -y line each, via ``-y @file``) —
    used for stateful two-packet protocols like Security+."""
    if "|" in code:
        import tempfile
        with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
            f.write("\n".join(code.split("|")) + "\n")
            path = f.name
        try:
            out = subprocess.run(
                [BIN, "-R", str(num), "-y", "@" + path, "-F", "json"],
                capture_output=True, text=True, timeout=30)
        finally:
            os.unlink(path)
    else:
        out = subprocess.run(
            [BIN, "-R", str(num), "-y", code, "-F", "json"],
            capture_output=True, text=True, timeout=30)
    evs = []
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            evs.append(json.loads(line))
    return evs


def _our_events(num, code):
    rx = RtlTpu(register_all=False, report_time="off")
    arg = None
    if isinstance(num, str) and ":" in num:
        n, arg = num.split(":", 1)
        num = int(n)
    rx.registry.register(num, arg)
    evs = []
    for part in code.split("|"):
        evs += rx.decode_test_string(part)
    return [json.loads(
        __import__("rtl_433_tpu.output.data_model", fromlist=["event_to_json"])
        .event_to_json(e)) for e in evs]


def _normalize(ev):
    ev = dict(ev)
    ev.pop("time", None)
    # the reference -F json prints doubles with %.3f; compare at that
    # granularity
    return {k: (round(v, 3) if isinstance(v, float) else v)
            for k, v in ev.items()}


@pytest.fixture(scope="session")
def rtl433():
    if not os.path.exists(BIN):
        pytest.skip("reference binary not built")
    return BIN


@pytest.mark.parametrize(
    "num,code,min_events", VECTORS,
    ids=[f"{i}-p{v[0]}" for i, v in enumerate(VECTORS)])
def test_decoder_matches_reference(rtl433, num, code, min_events):
    ref = _ref_events(num, code)
    ours = _our_events(num, code)
    assert len(ref) >= min_events, f"reference produced no event: {ref}"
    assert len(ours) == len(ref), (
        f"event count mismatch: ours={ours} ref={ref}")
    for a, b in zip(ours, ref):
        assert _normalize(a) == _normalize(b)


def _mutate(code: str, bitpos: int) -> str:
    """Flip one data bit inside the first {n}hex group it lands in."""
    import re
    out = []
    for part in re.split(r"([ |])", code):
        if not part.startswith("{") or bitpos < 0:
            out.append(part)
            continue
        n = int(part[1:part.index("}")])
        if bitpos >= n:
            bitpos -= n
            out.append(part)
            continue
        hexpart = part[part.index("}") + 1:]
        ndig = len(hexpart)
        v = int(hexpart, 16) if hexpart else 0
        v ^= 1 << (ndig * 4 - 1 - bitpos)
        out.append("{%d}%0*x" % (n, ndig, v))
        bitpos = -1
    return "".join(out)


@pytest.mark.parametrize(
    "num,code,min_events", VECTORS,
    ids=[f"{i}-p{v[0]}" for i, v in enumerate(VECTORS)])
def test_decoder_mutation_fuzz(rtl433, num, code, min_events):
    """Bit-flip mutations of known-good vectors must produce identical
    accept/reject decisions and identical events on both implementations."""
    import random
    if not code.lstrip().startswith("{"):
        pytest.skip("RfRaw pulse-train vector: no {n}hex groups to mutate")
    numkey = int(str(num).split(":")[0])
    rng = random.Random(numkey * 1000 + len(code))
    import re
    total_bits = sum(int(p[1:p.index("}")]) for p in re.split(r"[ |]", code)
                     if p.startswith("{"))
    for _ in range(12):
        mut = _mutate(code, rng.randrange(total_bits))
        ref = [_normalize(e) for e in _ref_events(num, mut)]
        ours = [_normalize(e) for e in _our_events(num, mut)]
        assert ours == ref, f"mutated code {mut}: ours={ours} ref={ref}"


# MIC-valid packets for these two protocols CRASH the reference binary
# (varargs UB in the reference decoders: fineoffset_wh43.c passes a float
# expression as DATA_INT; rfm69_lowpowerlab_moteino.c passes ints as
# DATA_STRING pointers). Our decoders emit the intended fields instead; the
# reference segfault (rc=-SIGSEGV) is asserted to document the divergence.
def test_wh43_decodes_where_reference_crashes(rtl433):
    from rtl_433_tpu.bits import util as _u
    msg = [0x43, 0x12, 0x34, 0x56, 0x42, 0x58, 0x81, 0xF4]
    crc = _u.crc8(bytes(msg), 8, 0x31, 0x00)
    s = (sum(msg) + crc) & 0xFF
    bits = "".join(format(b, "08b")
                   for b in [0xAA, 0x2D, 0xD4] + msg + [crc, s])
    code = "{%d}%x" % (len(bits), int(bits, 2))
    ours = _our_events(283, code)
    assert ours and ours[0]["model"] == "Fineoffset-WH43"
    out = subprocess.run([rtl433, "-R", "283", "-y", code, "-F", "json"],
                         capture_output=True, text=True, timeout=30)
    assert out.returncode < 0, "reference no longer crashes — compare events"


def test_rfm69_decodes_where_reference_crashes(rtl433):
    from rtl_433_tpu.bits import util as _u
    paylen = 10
    payload = [paylen, 5, 2, 0x00] + list(b"HELLO\x00") + [0]
    crc = (~_u.crc16(bytes(payload), paylen + 1, 0x1021, 0x1D0F)) & 0xFFFF
    frame = [0xAA, 0xAA, 0xAA, 0x2D, 0xD4] + payload + [crc >> 8, crc & 0xFF]
    bits = "".join(format(b, "08b") for b in frame)
    code = "{%d}%x" % (len(bits), int(bits, 2))
    ours = _our_events(318, code)
    assert ours and ours[0]["model"] == "Moteino-RFM69"
    assert ours[0]["msg"] == "HELLO"
    out = subprocess.run([rtl433, "-R", "318", "-y", code, "-F", "json"],
                         capture_output=True, text=True, timeout=30)
    assert out.returncode < 0, "reference no longer crashes — compare events"
