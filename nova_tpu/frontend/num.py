"""Number gadgets (reference: src/frontend/gadgets/num.rs)."""

from __future__ import annotations

from typing import List, Optional

from nova_tpu.errors import AssignmentMissingError, NovaError
from nova_tpu.frontend.boolean import AllocatedBit, Boolean, field_into_allocated_bits_le
from nova_tpu.frontend.constraint_system import (
    ConstraintSystem,
    LinearCombination,
    ONE,
    Variable,
)


class AllocatedNum:
    __slots__ = ("value", "variable")

    def __init__(self, variable: Variable, value: Optional[int]):
        self.variable = variable
        self.value = value

    def get_value(self):
        return self.value

    def get_variable(self):
        return self.variable

    @staticmethod
    def from_parts(variable: Variable, value: Optional[int]) -> "AllocatedNum":
        return AllocatedNum(variable, value)

    @staticmethod
    def one(cs: ConstraintSystem) -> "AllocatedNum":
        return AllocatedNum(ONE, 1)

    @staticmethod
    def alloc(cs: ConstraintSystem, value) -> "AllocatedNum":
        v = cs._resolve(value)
        var = cs.alloc(v)
        return AllocatedNum(var, v)

    @staticmethod
    def alloc_input(cs: ConstraintSystem, value) -> "AllocatedNum":
        v = cs._resolve(value)
        var = cs.alloc_input(v)
        return AllocatedNum(var, v)

    def inputize(self, cs: ConstraintSystem):
        inp = cs.alloc_input(self.value)
        cs.enforce(
            LinearCombination.from_variable(inp),
            LinearCombination.from_variable(ONE),
            LinearCombination.from_variable(self.variable),
        )

    def add(self, cs: ConstraintSystem, other: "AllocatedNum") -> "AllocatedNum":
        p = cs.field.p
        v = None if self.value is None or other.value is None else (self.value + other.value) % p
        var = cs.alloc(v)
        cs.enforce(
            LinearCombination.from_variable(self.variable) + other.variable,
            LinearCombination.from_variable(ONE),
            LinearCombination.from_variable(var),
        )
        return AllocatedNum(var, v)

    def mul(self, cs: ConstraintSystem, other: "AllocatedNum") -> "AllocatedNum":
        p = cs.field.p
        v = None if self.value is None or other.value is None else self.value * other.value % p
        var = cs.alloc(v)
        cs.enforce(
            LinearCombination.from_variable(self.variable),
            LinearCombination.from_variable(other.variable),
            LinearCombination.from_variable(var),
        )
        return AllocatedNum(var, v)

    def square(self, cs: ConstraintSystem) -> "AllocatedNum":
        p = cs.field.p
        v = None if self.value is None else self.value * self.value % p
        var = cs.alloc(v)
        cs.enforce(
            LinearCombination.from_variable(self.variable),
            LinearCombination.from_variable(self.variable),
            LinearCombination.from_variable(var),
        )
        return AllocatedNum(var, v)

    def assert_nonzero(self, cs: ConstraintSystem):
        if self.value is not None:
            if self.value == 0:
                raise NovaError("assert_nonzero on zero")
            inv_v = cs.field.inv(self.value)
        else:
            inv_v = None
        inv = cs.alloc(inv_v)
        cs.enforce(
            LinearCombination.from_variable(self.variable),
            LinearCombination.from_variable(inv),
            LinearCombination.from_variable(ONE),
        )

    def to_bits_le(self, cs: ConstraintSystem) -> List[Boolean]:
        bits = field_into_allocated_bits_le(cs, self.value)
        lc = LinearCombination.zero()
        coeff = 1
        for bit in bits:
            lc.add_term(coeff, bit.variable)
            coeff <<= 1
        lc = lc - self.variable
        cs.enforce(LinearCombination.zero(), LinearCombination.zero(), lc)
        return [Boolean.from_bit(b) for b in bits]

    def to_bits_le_strict(self, cs: ConstraintSystem) -> List[Boolean]:
        """Strict in-field decomposition (num.rs:149-272): while emitting
        big-endian bits of the value, run k-ary ANDs over the runs of ones
        of p-1 so that bits in 'free' positions are forced to zero whenever
        all more-significant one-run bits are set."""
        field = cs.field
        num_bits = field.num_bits
        a_bits_be = (
            None
            if self.value is None
            else [bool((self.value >> i) & 1) for i in range(num_bits)][::-1]
        )
        b_be = [bool(((field.p - 1) >> i) & 1) for i in range(num_bits)][::-1]

        def kary_and(bits_: List[AllocatedBit]) -> AllocatedBit:
            cur = bits_[0]
            for b in bits_[1:]:
                cur = AllocatedBit.and_(cs, cur, b)
            return cur

        result: List[AllocatedBit] = []
        last_run: Optional[AllocatedBit] = None
        current_run: List[AllocatedBit] = []
        found_one = False
        ai = 0
        for b in b_be:
            a_bit = None if a_bits_be is None else a_bits_be[ai]
            ai += 1
            found_one = found_one or b
            if not found_one:
                continue
            if b:
                bit = AllocatedBit.alloc(cs, a_bit)
                current_run.append(bit)
                result.append(bit)
            else:
                if current_run:
                    if last_run is not None:
                        current_run.append(last_run)
                    last_run = kary_and(current_run)
                    current_run = []
                bit = AllocatedBit.alloc_conditionally(cs, a_bit, last_run)
                result.append(bit)
        assert not current_run

        lc = LinearCombination.zero()
        coeff = 1
        for bit in reversed(result):
            lc.add_term(coeff, bit.variable)
            coeff <<= 1
        lc = lc - self.variable
        cs.enforce(LinearCombination.zero(), LinearCombination.zero(), lc)
        return [Boolean.from_bit(b) for b in reversed(result)]

    @staticmethod
    def conditionally_reverse(cs, a: "AllocatedNum", b: "AllocatedNum", condition: Boolean):
        p = cs.field.p
        cv = condition.get_value()

        def val_c():
            if cv is None or a.value is None or b.value is None:
                return None
            return b.value if cv else a.value

        def val_d():
            if cv is None or a.value is None or b.value is None:
                return None
            return a.value if cv else b.value

        c = AllocatedNum.alloc(cs, val_c())
        cs.enforce(
            LinearCombination.from_variable(a.variable) - b.variable,
            condition.lc(ONE, 1),
            LinearCombination.from_variable(a.variable) - c.variable,
        )
        d = AllocatedNum.alloc(cs, val_d())
        cs.enforce(
            LinearCombination.from_variable(b.variable) - a.variable,
            condition.lc(ONE, 1),
            LinearCombination.from_variable(b.variable) - d.variable,
        )
        return c, d


class Num:
    """A number as a linear combination (num.rs:495-578)."""

    __slots__ = ("value", "lc")

    def __init__(self, value: Optional[int] = 0, lc: Optional[LinearCombination] = None):
        self.value = value
        self.lc = lc if lc is not None else LinearCombination.zero()

    @staticmethod
    def zero() -> "Num":
        return Num(0, LinearCombination.zero())

    @staticmethod
    def from_allocated(num: AllocatedNum) -> "Num":
        return Num(num.value, LinearCombination.from_variable(num.variable))

    def get_value(self):
        return self.value

    def to_lc(self, coeff: int = 1) -> LinearCombination:
        return LinearCombination.zero().add_lc(self.lc, coeff)

    def add_bool_with_coeff(self, one: Variable, bit: Boolean, coeff: int, p: int) -> "Num":
        bv = bit.get_value()
        if self.value is None or bv is None:
            newval = None
        else:
            newval = (self.value + coeff) % p if bv else self.value
        return Num(newval, self.lc.copy().add_lc(bit.lc(one, coeff)))

    def add(self, other: "Num", p: int) -> "Num":
        if self.value is None or other.value is None:
            v = self.value if other.value is None else other.value
        else:
            v = (self.value + other.value) % p
        return Num(v, self.lc.copy().add_lc(other.lc))

    def scale(self, scalar: int, p: int) -> "Num":
        lc = self.lc.copy().scale(scalar)
        v = None if self.value is None else self.value * scalar % p
        return Num(v, lc)
