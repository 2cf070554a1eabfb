"""Synthetic CSPro DCF/DAT fixtures encoding the reference's invariants
(FIXTURES.md §2: padded keys, id-item replay, ranges, relations, unknown
record tags)."""

DCF_TEXT = """\
[Dictionary]
Version=CSPro 7.0
Label=Test survey dictionary
Name=TESTDICT
RecordTypeStart=16
RecordTypeLen=3
Positions=Relative
ZeroFill=Yes
DecimalChar=No

[Languages]
EN=English

[Level]
Label=Household
Name=HOUSEHOLD

[IdItems]

[Item]
Label=Case Identification
Name=CASEID
Start=1
Len=15

[Record]
Label=Household's basic data
Name=RECH0
RecordTypeValue='H00'

[Item]
Label=Month of interview
Name=HV006
Start=19
Len=2

[ValueSet]
Label=Month of interview
Name=HV006_VS1
Value=1:12

[Item]
Label=Result of interview
Name=HV015
Start=21
Len=1

[ValueSet]
Label=Result of interview
Name=HV015_VS1
Value=1;Completed
Value=2;Not at home
Value=9;Other reason

[Record]
Label=Household member schedule
Name=RECH1
RecordTypeValue='H01'

[Item]
Label=Line number
Name=HVIDX
Start=19
Len=2

[Item]
Label=Age of member
Name=HV105
Start=21
Len=3

[ValueSet]
Label=Age of member
Name=HV105_VS1
Value=0:95
Value=96:997;Error range
Value=998;DK

[Item]
Label=Weight in kg
Name=HV438
Start=24
Len=7

[ValueSet]
Label=Weight in kg
Name=HV438_VS1
Value=0:9000000

[Record]
Label=CS: country specific extras
Name=RECH4A
RecordTypeValue='H4A'

[Item]
Label=Index to household schedule
Name=IDXH4
Start=19
Len=2

[Item]
Label=Extra question one
Name=SH110A
Start=21
Len=1

[Relation]
Name=HH_MEMBERS
Primary=RECH1
PrimaryLink=HVIDX
Secondary=RECH4A
SecondaryLink=IDXH4

[Relation]
Name=OCC_JOIN
Primary=RECH1
Secondary=RECH4A
"""

# record tag at cols 16-18 (1-based); CASEID cols 1-15 (padding significant)
DAT_LINES = [
    "       1   901 H00 31",  # RECH0: caseid='       1   901 ', hv006='3', hv015='1'
    "       1   901 H01 1 25    ",  # RECH1 member 1 age 25
    "       1   901 H01 2  7    ",  # RECH1 member 2 age 7
    "       1   901 H4A 1 5",  # RECH4A idx 1
    "       2   902 H00129",  # second household, hv006='12', hv015='9'
    "       2   902 H01 1 31    ",
    "       2   902 XXX junk",  # unknown record type -> skipped
]
